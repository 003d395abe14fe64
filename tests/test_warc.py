"""WARC/WET web-archive source (sources/warc.py): pure-Python record
parser, multi-member gzip handling, quarantine contract, and the
WET → cleaning-pipeline composition."""

from __future__ import annotations

import gzip

import pytest

from chess_lakehouse_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    wet_documents,
)


def _record(
    warc_type: str,
    url: str | None,
    body: bytes,
    rid: str = "<urn:uuid:0001>",
    date: str = "2024-01-01T00:00:00Z",
    ctype: str = "text/plain",
) -> bytes:
    head = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: {rid}",
        f"WARC-Date: {date}",
        f"Content-Type: {ctype}",
        f"Content-Length: {len(body)}",
    ]
    if url is not None:
        head.insert(2, f"WARC-Target-URI: {url}")
    return "\r\n".join(head).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"


def _wet_file() -> bytes:
    return (
        _record("warcinfo", None, b"software: test\r\n", rid="<urn:uuid:info>")
        + _record(
            "conversion", "http://a.example/page", "alpha beta gamma".encode(),
            rid="<urn:uuid:a>",
        )
        + _record(
            "conversion", "http://b.example/page", "delta epsilon".encode(),
            rid="<urn:uuid:b>",
        )
    )


def test_parse_warc_records_fields_and_order():
    recs = parse_warc_records(_wet_file())
    assert [r["warc_type"] for r in recs] == ["warcinfo", "conversion", "conversion"]
    assert recs[1]["url"] == "http://a.example/page"
    assert recs[1]["content"] == b"alpha beta gamma"
    assert recs[1]["content_length"] == 16
    assert recs[0]["url"] is None
    # headers are case-insensitive per spec
    lower = _wet_file().replace(b"Content-Length", b"content-length")
    assert len(parse_warc_records(lower)) == 3


def test_parse_warc_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="WARC"):
        parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")
    good = _wet_file()
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_records(good[:-6])  # cuts into the last content block
    with pytest.raises(ValueError, match="unterminated"):
        parse_warc_records(good[:-20])  # cuts into the last header block
    no_len = _record("conversion", "http://x", b"body").replace(
        b"Content-Length: 4\r\n", b""
    )
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_records(no_len)


def test_read_warc_plain_gz_and_multimember(spark, tmp_path):
    """A plain .wet, a whole-file gzip, and a per-record multi-member
    gzip (the CommonCrawl layout) must all parse identically."""
    raw = _wet_file()
    (tmp_path / "a.wet").write_bytes(raw)
    (tmp_path / "b.wet.gz").write_bytes(gzip.compress(raw))
    members = b"".join(
        gzip.compress(_record("conversion", f"http://m{i}.example", b"mm"))
        for i in range(3)
    )
    (tmp_path / "c.wet.gz").write_bytes(members)

    got = read_warc(spark, str(tmp_path)).collect()
    assert all(r["parse_error"] is None for r in got)
    by_file = {}
    for r in got:
        by_file.setdefault(r["warc_file"].rsplit("/", 1)[-1], []).append(r)
    assert len(by_file["a.wet"]) == 3
    assert len(by_file["b.wet.gz"]) == 3
    assert len(by_file["c.wet.gz"]) == 3
    assert sorted(r["url"] for r in by_file["c.wet.gz"]) == [
        "http://m0.example", "http://m1.example", "http://m2.example",
    ]
    # type filter runs inside the parse task
    conv = read_warc(spark, str(tmp_path), warc_types=("conversion",)).collect()
    assert len(conv) == 7 and all(r["warc_type"] == "conversion" for r in conv)


def test_read_warc_quarantines_bad_file_not_job(spark, tmp_path):
    (tmp_path / "good.wet").write_bytes(_wet_file())
    (tmp_path / "bad.wet").write_bytes(b"this is not a warc file at all")
    rows = read_warc(spark, str(tmp_path)).collect()
    bad = [r for r in rows if r["parse_error"] is not None]
    assert len(bad) == 1 and "WARC" in bad[0]["parse_error"]
    assert bad[0]["record_idx"] == -1 and bad[0]["url"] is None
    assert len([r for r in rows if r["parse_error"] is None]) == 3


def test_wet_documents_feeds_cleaning_pipeline(spark, tmp_path):
    """The composition the module exists for: WET records → documents
    shape → a quality gate runs on the decoded text."""
    from pyspark.sql import functions as F

    (tmp_path / "crawl.wet.gz").write_bytes(gzip.compress(_wet_file()))
    docs = wet_documents(read_warc(spark, str(tmp_path)))
    assert docs.columns == ["url", "warc_date", "text"]
    got = {r["url"]: r["text"] for r in docs.collect()}
    assert got == {
        "http://a.example/page": "alpha beta gamma",
        "http://b.example/page": "delta epsilon",
    }
    counted = docs.select(
        "url", F.size(F.split("text", " ")).alias("n_tokens")
    ).collect()
    assert {r["url"]: r["n_tokens"] for r in counted} == {
        "http://a.example/page": 3,
        "http://b.example/page": 2,
    }


def test_pipeline_cli_read_wet_stage(spark, tmp_path, capsys):
    import gzip
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "seg0.wet.gz").write_bytes(gzip.compress(_wet_file()))
    (src / "bad.wet").write_bytes(b"garbage")
    out = tmp_path / "docs"
    q = tmp_path / "quarantine"
    pipeline_cli.main([
        "read-wet", "--inDir", str(src), "--outDir", str(out),
        "--quarantineDir", str(q),
    ])
    docs = spark.read.parquet(str(out))
    assert docs.columns == ["url", "warc_date", "text", "doc_id"]
    assert docs.count() == 2
    assert docs.select("doc_id").distinct().count() == 2
    bad = spark.read.parquet(str(q)).collect()
    assert len(bad) == 1 and "WARC" in bad[0]["parse_error"]
    assert "docs=2 quarantined_files=1" in capsys.readouterr().out


def test_response_documents_splits_http_and_feeds_strip_html(spark, tmp_path):
    """Raw WARC response records: HTTP header/body split, status +
    Content-Type parsed, lossy utf-8 decode never errors, and the body
    composes with the C4-class HTML strip."""
    from chess_lakehouse_spark.functions.text import strip_html
    from chess_lakehouse_spark.sources.warc import response_documents

    html = b"<html><body><p>Hello  crawl</p></body></html>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"\r\n" + html
    )
    bad_bytes = b"HTTP/1.1 200 OK\r\n\r\n<p>caf\xe9 latin-1</p>"  # invalid utf-8
    warc = (
        _record("response", "http://h.example/", http, ctype="application/http")
        + _record("response", "http://l.example/", bad_bytes, ctype="application/http")
        + _record("conversion", "http://skip.example/", b"text")
    )
    (tmp_path / "raw.warc").write_bytes(warc)
    docs = response_documents(read_warc(spark, str(tmp_path)))
    got = {r["url"]: r for r in docs.collect()}
    assert set(got) == {"http://h.example/", "http://l.example/"}
    assert got["http://h.example/"]["http_status"] == 200
    assert got["http://h.example/"]["http_content_type"] == "text/html; charset=utf-8"
    assert "<p>" in got["http://h.example/"]["html"]
    assert "caf�" in got["http://l.example/"]["html"]  # lossy, not fatal

    stripped = docs.select(
        "url", strip_html(docs["html"]).alias("text")
    ).collect()
    texts = {r["url"]: r["text"] for r in stripped}
    assert texts["http://h.example/"] == "Hello crawl"


def test_read_warc_stream_parses_new_files_once(spark, tmp_path):
    """The streaming source shares the batch parser: records land once,
    a restart with nothing new re-emits nothing, and a later drop emits
    only the new archive's records."""
    import gzip

    from chess_lakehouse_spark.sources.warc import read_warc_stream

    drops = tmp_path / "crawl"
    drops.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    (drops / "seg0.wet.gz").write_bytes(gzip.compress(_wet_file()))

    def run():
        q = (
            read_warc_stream(spark, str(drops), warc_types=("conversion",))
            .select("url", "record_idx")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert sorted(r["url"] for r in spark.read.parquet(out).collect()) == [
        "http://a.example/page", "http://b.example/page",
    ]
    run()  # nothing new: checkpoint prevents re-parse
    assert spark.read.parquet(out).count() == 2
    (drops / "seg1.wet.gz").write_bytes(
        gzip.compress(_record("conversion", "http://c.example/page", b"zz"))
    )
    run()
    assert sorted(r["url"] for r in spark.read.parquet(out).collect()) == [
        "http://a.example/page", "http://b.example/page", "http://c.example/page",
    ]


def test_clean_corpus_ingests_wet_directly(spark, tmp_path, capsys):
    """--inFormat wet: one CLI invocation goes CommonCrawl-layout archive →
    quarantine sidecar → URL pass → quality gate → dedup → split shards —
    the full cleaning pipeline with zero intermediate stage."""
    import gzip
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    recs = []
    for i in range(12):
        text = " ".join(f"w{0 if i <= 1 else i}_{j}" for j in range(40))
        # docs 0 and 1: same content, different urls (near-dup survives one);
        # doc 11 shares doc 10's URL exactly (URL pass drops one)
        url = f"http://site{10 if i == 11 else i}.example/page"
        recs.append(
            _record(
                "conversion", url, text.encode(),
                rid=f"<urn:uuid:{i}>", date=f"2024-01-{i + 1:02d}T00:00:00Z",
            )
        )
    src = tmp_path / "crawl"
    src.mkdir()
    (src / "seg.wet.gz").write_bytes(gzip.compress(b"".join(recs)))
    (src / "bad.wet").write_bytes(b"garbage")
    out = tmp_path / "out"

    pipeline_cli.main([
        "clean-corpus", "--inDir", str(src), "--outDir", str(out),
        "--inFormat", "wet", "--urlCol", "url",
        "--minQuality", "0.0", "--threshold", "0.5", "--evalFrac", "0.3",
    ])
    stdout = capsys.readouterr().out
    assert "[clean-corpus]" in stdout and "quarantined=1" in stdout
    assert (out / "quarantine").exists()
    published = spark.read.json(str(out / "corpus")).collect()
    # 12 docs - 1 URL-exact dup - 1 content near-dup = 10
    assert len(published) == 10
    assert all(r.source == "commoncrawl" for r in published)
    assert len({r.doc_id for r in published}) == 10


def test_commoncrawl_layout_fixture_end_to_end(spark):
    """The checked-in CommonCrawl-layout archive
    (tests/fixtures/cc_sample.warc.gz, generated byte-stable by
    make_cc_sample.py — hand-built to the published layout since the
    sandbox has no network): warcinfo/request/response/metadata/
    conversion records, a FOLDED WARC header, a chunked HTTP body with a
    chunk extension + uppercase hex size + trailer, an ISO-8859-1 body
    whose bytes are invalid UTF-8, and NUL/control bytes inside HTML —
    all must parse, de-chunk, and decode to exact expected text."""
    import hashlib
    from pathlib import Path

    from chess_lakehouse_spark.sources.warc import response_documents

    fx = Path(__file__).parent / "fixtures" / "cc_sample.warc.gz"
    assert (
        hashlib.sha256(fx.read_bytes()).hexdigest()
        == "377287b78835b54e0c1a5facdd1be5044a5dcf84a244d56bd815125a8994864c"
    ), "fixture bytes drifted — regenerate with make_cc_sample.py"

    recs = read_warc(spark, str(fx))
    rows = sorted(recs.collect(), key=lambda r: r.record_idx)
    assert [r.warc_type for r in rows] == [
        "warcinfo", "request", "response", "response", "metadata", "conversion",
    ]
    assert all(r.parse_error is None for r in rows)
    # folded header reconstructs per ISO 28500 (CRLF+WSP -> single SP)
    assert rows[2].content_type == "application/http; msgtype=response"

    docs = {
        r.url: r
        for r in response_documents(recs).collect()
    }
    lat = docs["https://example.com/caf%C3%A9"]
    assert lat.http_status == 200
    assert lat.http_content_type == "text/html; charset=ISO-8859-1"
    # declared-charset decode: 0xE9 -> 'é', 0xFF -> 'ÿ', NUL/ESC preserved
    assert lat.html == (
        "<html><body>café ÿ<!-- \x00\x1b wild bytes -->"
        "</body></html>"
    )
    ch = docs["https://example.com/chunked"]
    assert ch.http_status == 200
    # chunked wire framing removed, trailers dropped, exact reassembly
    assert ch.html == (
        "<html><body><p>chunk one and chunk two\n</p></body></html>\n"
    )

    wet = {r.url: r.text for r in wet_documents(recs).collect()}
    assert wet == {
        "https://example.com/chunked": (
            "chunk one and chunk two\né中\U0001f600 extracted text\n"
        )
    }


def test_parse_warc_records_header_folding_and_dechunk_fallbacks():
    """Unit edges: a continuation line before any field is ignored (not a
    crash), and a malformed chunk stream falls back to the raw bytes."""
    body = b"x"
    raw = (
        b"WARC/1.0\r\n"
        b" orphan continuation\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Target-URI: http://e/\r\n"
        b" continued-uri-tail\r\n"
        b"Content-Length: 1\r\n\r\n" + body + b"\r\n\r\n"
    )
    recs = parse_warc_records(raw)
    assert len(recs) == 1
    assert recs[0]["url"] == "http://e/ continued-uri-tail"
