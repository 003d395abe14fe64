"""WARC / WET web-archive sources — the CommonCrawl entry point.

The C4 / CCNet / RefinedWeb pipelines this engine's cleaning operators
implement (SURVEY.md §2.13) all START from CommonCrawl's WARC (raw HTTP
capture) and WET (extracted-text) archives; this module is the missing
first stage: archive file → (record_id, url, date, content) rows that
feed straight into ``strip_html`` → quality gates → dedup.

Format (public spec, ISO 28500): a WARC file is a sequence of records —
``WARC/1.0\\r\\n`` + header lines + ``\\r\\n\\r\\n`` + content block of
``Content-Length`` bytes + ``\\r\\n\\r\\n``. ``.warc.gz`` / ``.wet.gz``
files are MULTI-MEMBER gzip streams (one member per record, the spec's
recommendation precisely so readers can split them); plain ``zlib``
handles both via a member-by-member decompress loop — no archive library.

Spark-first contract:

- **Whole-file tasks via ``binaryFile``.** WARC members are not
  line-splittable mid-record, so the unit of parallelism is the archive
  file — exactly how CommonCrawl ships (segments of ~1 GB gz files, tens
  of thousands per crawl: file-level parallelism saturates any cluster).
  The parse itself is an Arrow-batched ``mapInPandas`` over file rows.
- **Executor memory bounds.** One task holds one archive + its decoded
  records; CommonCrawl-sized (~1 GB) files fit comfortably in standard
  executor sizing, and ``pathGlobFilter``/input listing control which
  files a job touches. For bespoke oversized archives, split upstream.
- **Quarantine, not job failure.** A malformed record yields one row with
  NULL parsed fields and the error in ``parse_error`` (the JSONL
  corrupt-record pattern); a malformed FILE yields one such row for the
  file. A single bad member in shard 40,000 cannot kill the ingest.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_idx int, record_id string, warc_type string, "
    "url string, warc_date string, content_type string, content_length long, "
    "content binary, parse_error string"
)


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream with zlib alone —
    each WARC record is its own member, so loop until the tail is
    exhausted. Non-gzip input is returned unchanged."""
    if len(payload) < 2 or payload[:2] != b"\x1f\x8b":
        return payload
    out, data = [], payload
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data))
        data = d.unused_data
    return b"".join(out)


def parse_warc_records(payload: bytes):
    """Parse one (decompressed) WARC/WET byte stream into record dicts:
    {record_id, warc_type, url, warc_date, content_type, content_length,
    content} — pure function shared by the Spark source and the tests.
    Raises ValueError on a stream that is not WARC at all; individual
    trailing garbage after valid records raises too (the caller
    quarantines). Header names are case-insensitive per the spec."""
    if not payload.lstrip(b"\r\n").startswith(b"WARC/"):
        raise ValueError("not a WARC stream (missing WARC/ version line)")
    pos, out = 0, []
    n = len(payload)
    while pos < n:
        # skip inter-record blank lines (record terminator = \r\n\r\n)
        while pos < n and payload[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        hdr_end = payload.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"record at byte {pos}: unterminated header block")
        head = payload[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"record at byte {pos}: bad version line {head[0]!r}")
        fields: dict[str, str] = {}
        last_key: str | None = None
        for line in head[1:]:
            if line[:1] in (" ", "\t") and last_key is not None:
                # ISO 28500 header folding: a continuation line extends the
                # previous field's value (real crawls emit folded headers)
                fields[last_key] = f"{fields[last_key]} {line.strip()}"
            elif ":" in line:
                k, v = line.split(":", 1)
                last_key = k.strip().lower()
                fields[last_key] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"record at byte {pos}: missing/bad Content-Length")
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError(f"record at byte {pos}: truncated content block")
        out.append(
            {
                "record_id": fields.get("warc-record-id"),
                "warc_type": fields.get("warc-type"),
                "url": fields.get("warc-target-uri"),
                "warc_date": fields.get("warc-date"),
                "content_type": fields.get("content-type"),
                "content_length": clen,
                "content": payload[body_start : body_start + clen],
            }
        )
        pos = body_start + clen
    return out


def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: tuple = (),
) -> DataFrame:
    """WARC/WET archive source: one output row per record across every
    archive matched by ``path`` (a ``binaryFile`` glob — ``.warc``,
    ``.warc.gz``, ``.wet``, ``.wet.gz``). ``warc_types`` optionally
    restricts to e.g. ``("response", "conversion")`` — the filter runs
    inside the parse task, before rows ever reach Spark. Malformed files
    or streams yield a single quarantine row (NULL fields +
    ``parse_error``) per file instead of failing the job. Returns
    WARC_SCHEMA rows; ``content`` is the raw block (HTTP headers + HTML
    for WARC response records, plain text for WET conversion records).
    """
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        _parse_archives(warc_types), schema=WARC_SCHEMA
    )


def read_warc_stream(
    spark: SparkSession,
    path: str,
    warc_types: tuple = (),
) -> DataFrame:
    """Streaming twin of :func:`read_warc` — the continuous-crawl ingest:
    new archive files landing under ``path`` become record rows through
    the SAME parse function (one implementation, no drift), ready for a
    ``foreachBatch`` sink or the corpus-cleaning streaming loops. The
    ``binaryFile`` stream source tracks processed files in the
    checkpoint, so each archive is parsed exactly once across restarts;
    the explicit schema below is the fixed ``binaryFile`` row shape
    (streaming sources cannot infer). Same quarantine contract."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = spark.readStream.format("binaryFile").schema(schema).load(path)
    return files.select("path", "content").mapInPandas(
        _parse_archives(warc_types), schema=WARC_SCHEMA
    )


def _parse_archives(warc_types: tuple):
    """mapInPandas body shared by the batch and streaming archive sources."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "warc_file": [], "record_idx": [], "record_id": [],
                "warc_type": [], "url": [], "warc_date": [],
                "content_type": [], "content_length": [], "content": [],
                "parse_error": [],
            }

            def _quarantine(fname: str, err: str) -> None:
                rows["warc_file"].append(fname)
                rows["record_idx"].append(-1)
                for k in (
                    "record_id", "warc_type", "url", "warc_date",
                    "content_type", "content_length", "content",
                ):
                    rows[k].append(None)
                rows["parse_error"].append(err)

            for fname, blob in zip(pdf["path"], pdf["content"]):
                try:
                    recs = parse_warc_records(_gunzip_members(bytes(blob)))
                except Exception as e:  # noqa: BLE001 - quarantine contract
                    _quarantine(fname, str(e))
                    continue
                for i, r in enumerate(recs):
                    if warc_types and r["warc_type"] not in warc_types:
                        continue
                    rows["warc_file"].append(fname)
                    rows["record_idx"].append(i)
                    rows["record_id"].append(r["record_id"])
                    rows["warc_type"].append(r["warc_type"])
                    rows["url"].append(r["url"])
                    rows["warc_date"].append(r["warc_date"])
                    rows["content_type"].append(r["content_type"])
                    rows["content_length"].append(r["content_length"])
                    rows["content"].append(r["content"])
                    rows["parse_error"].append(None)
            yield pd.DataFrame(
                {
                    "warc_file": pd.Series(rows["warc_file"], dtype="object"),
                    "record_idx": pd.Series(rows["record_idx"], dtype="int32"),
                    "record_id": pd.Series(rows["record_id"], dtype="object"),
                    "warc_type": pd.Series(rows["warc_type"], dtype="object"),
                    "url": pd.Series(rows["url"], dtype="object"),
                    "warc_date": pd.Series(rows["warc_date"], dtype="object"),
                    "content_type": pd.Series(rows["content_type"], dtype="object"),
                    "content_length": pd.array(
                        rows["content_length"], dtype="Int64"
                    ),
                    "content": pd.Series(rows["content"], dtype="object"),
                    "parse_error": pd.Series(rows["parse_error"], dtype="object"),
                }
            )

    return _parse


def wet_documents(records: DataFrame) -> DataFrame:
    """WET conversion records → the documents shape the cleaning pipeline
    consumes: (url, warc_date, text) with text utf-8-decoded. Pure column
    expressions (decode + filter) — rides the parse scan with zero extra
    Python. Compose: ``wet_documents(read_warc(spark, glob))`` →
    ``strip_html`` is unnecessary (WET is already extracted text) →
    quality gates → dedup."""
    from pyspark.sql import functions as F

    return (
        records.where(F.col("parse_error").isNull())
        .where(F.col("warc_type") == "conversion")
        .select(
            "url",
            "warc_date",
            F.decode(F.col("content"), "UTF-8").alias("text"),
        )
    )


def response_documents(records: DataFrame) -> DataFrame:
    """WARC *response* records (raw HTTP captures) → (url, warc_date,
    http_status, http_content_type, html) — the RAW-crawl twin of
    :func:`wet_documents`: split the HTTP header block from the body at
    the first blank line, parse the status line and Content-Type header,
    de-chunk a ``Transfer-Encoding: chunked`` body (raw captures keep the
    wire encoding; a malformed chunk stream falls back to the raw bytes
    rather than dropping the record), then decode with the charset the
    Content-Type DECLARES (``charset=`` parameter, errors-replace),
    falling back to utf-8-lossy when absent or unknown — replacement
    chars, never a decode error under ANSI, and no content sniffing
    beyond the declared header. Feed ``html`` into
    ``functions/text.py:strip_html`` → quality gates → dedup. Arrow-
    batched mapInPandas (byte splitting is not expressible as a column
    chain without ANSI-unsafe decodes); narrow, no shuffle."""
    from pyspark.sql import functions as F

    schema = (
        "url string, warc_date string, http_status int, "
        "http_content_type string, html string"
    )

    def _split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import codecs

        def _dechunk(body: bytes) -> bytes:
            """RFC 9112 §7.1 chunked decoding; returns the raw body
            unchanged if the stream is malformed (lossy-keep, matching
            the decode policy)."""
            pos, parts = 0, []
            while True:
                nl = body.find(b"\r\n", pos)
                if nl < 0:
                    return body
                size_tok = body[pos:nl].split(b";", 1)[0].strip()
                try:
                    size = int(size_tok, 16)
                except ValueError:
                    return body
                if size == 0:
                    return b"".join(parts)  # trailers (if any) are dropped
                start = nl + 2
                if start + size + 2 > len(body) or body[
                    start + size : start + size + 2
                ] != b"\r\n":
                    return body
                parts.append(body[start : start + size])
                pos = start + size + 2

        def _decode(body: bytes, ctype: str | None) -> str:
            cs = None
            if ctype and "charset=" in ctype.lower():
                cs = (
                    ctype.lower().split("charset=", 1)[1].split(";")[0].strip(
                        "\"' "
                    )
                )
            if cs:
                try:
                    return body.decode(codecs.lookup(cs).name, "replace")
                except LookupError:
                    pass
            return body.decode("utf-8", "replace")

        for pdf in batches:
            out: dict[str, list] = {
                "url": [], "warc_date": [], "http_status": [],
                "http_content_type": [], "html": [],
            }
            for url, date, blob in zip(
                pdf["url"], pdf["warc_date"], pdf["content"]
            ):
                b = bytes(blob)
                sep = b.find(b"\r\n\r\n")
                head, body = (b[:sep], b[sep + 4 :]) if sep >= 0 else (b"", b)
                status, ctype, chunked = None, None, False
                lines = head.decode("utf-8", "replace").split("\r\n")
                if lines and lines[0].startswith("HTTP/"):
                    parts = lines[0].split()
                    if len(parts) >= 2 and parts[1].isdigit():
                        status = int(parts[1])
                for line in lines[1:]:
                    low = line.lower()
                    if low.startswith("content-type:"):
                        ctype = line.split(":", 1)[1].strip()
                    elif low.startswith("transfer-encoding:") and "chunked" in low:
                        chunked = True
                if chunked:
                    body = _dechunk(body)
                out["url"].append(url)
                out["warc_date"].append(date)
                out["http_status"].append(status)
                out["http_content_type"].append(ctype)
                out["html"].append(_decode(body, ctype))
            yield pd.DataFrame(
                {
                    "url": pd.Series(out["url"], dtype="object"),
                    "warc_date": pd.Series(out["warc_date"], dtype="object"),
                    "http_status": pd.array(out["http_status"], dtype="Int32"),
                    "http_content_type": pd.Series(
                        out["http_content_type"], dtype="object"
                    ),
                    "html": pd.Series(out["html"], dtype="object"),
                }
            )

    return (
        records.where(F.col("parse_error").isNull())
        .where(F.col("warc_type") == "response")
        .select("url", "warc_date", "content")
        .mapInPandas(_split, schema=schema)
    )
