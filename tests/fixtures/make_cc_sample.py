"""Deterministic generator for ``cc_sample.warc.gz`` — a CommonCrawl-layout
WARC fixture (the sandbox has no network, so the fixture is hand-built
byte-for-byte to the published layout rather than downloaded: ISO 28500
records in CommonCrawl's order — warcinfo, request, response, metadata,
conversion — one gzip member per record, the spec's recommended framing
that CommonCrawl ships).

The records deliberately carry the wild-bytes edge cases the synthetic
in-test streams didn't: a folded (continuation-line) WARC header, a
``Transfer-Encoding: chunked`` HTTP body with a chunk extension, an
uppercase hex chunk size and a trailer header, an ISO-8859-1 body whose
bytes are invalid UTF-8, NUL and raw control bytes inside HTML, and a
UTF-8 conversion record with multi-byte codepoints.

Regenerate with ``python tests/fixtures/make_cc_sample.py`` (output is
byte-stable; the test pins its sha256).
"""

from __future__ import annotations

import gzip
from pathlib import Path


def _record(warc_type: str, extra_headers: list[str], content: bytes) -> bytes:
    head = ["WARC/1.0", f"WARC-Type: {warc_type}", *extra_headers,
            f"Content-Length: {len(content)}"]
    return ("\r\n".join(head) + "\r\n\r\n").encode("utf-8") + content + b"\r\n\r\n"


def build() -> bytes:
    date = "2024-02-20T12:00:00Z"

    warcinfo = _record(
        "warcinfo",
        [
            "WARC-Date: " + date,
            "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>",
            "WARC-Filename: cc_sample.warc.gz",
            "Content-Type: application/warc-fields",
        ],
        (
            "software: Apache Nutch 1.19 (modified)\r\n"
            "isPartOf: CC-MAIN-2024-10\r\n"
            "operator: Common Crawl Admin (info@commoncrawl.org)\r\n"
            "description: Wide crawl of the web for February 2024\r\n"
            "format: WARC File Format 1.1\r\n"
        ).encode("utf-8"),
    )

    request = _record(
        "request",
        [
            "WARC-Date: " + date,
            "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000002>",
            "WARC-Target-URI: https://example.com/caf%C3%A9",
            "Content-Type: application/http; msgtype=request",
        ],
        (
            "GET /caf%C3%A9 HTTP/1.1\r\n"
            "Host: example.com\r\n"
            "User-Agent: CCBot/2.0 (https://commoncrawl.org/faq/)\r\n"
            "Accept: text/html\r\n"
            "\r\n"
        ).encode("utf-8"),
    )

    # Latin-1 body: 0xE9 ('é'), 0xFF, a NUL and a bare 0x1B escape byte —
    # all invalid as UTF-8 — plus a FOLDED WARC Content-Type header.
    latin1_html = (
        b"<html><body>caf\xe9 \xff<!-- \x00\x1b wild bytes --></body></html>"
    )
    latin1_body = (
        b"HTTP/1.1 200 OK\r\n"
        b"Date: Tue, 20 Feb 2024 12:00:00 GMT\r\n"
        b"Content-Type: text/html; charset=ISO-8859-1\r\n"
        + f"Content-Length: {len(latin1_html)}\r\n".encode()
        + b"\r\n"
        + latin1_html
    )
    response_latin1 = _record(
        "response",
        [
            "WARC-Date: " + date,
            "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000003>",
            "WARC-Target-URI: https://example.com/caf%C3%A9",
            "Content-Type: application/http;",
            " msgtype=response",  # folded continuation line (ISO 28500)
        ],
        latin1_body,
    )

    # Chunked body: lowercase and UPPERCASE hex sizes, a chunk extension,
    # and a trailer header after the terminating 0-chunk.
    c1 = b"<html><body><p>chunk one "
    c2 = b"and chunk two\n"
    c3 = b"</p></body></html>\n"
    chunked_body = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Transfer-Encoding: chunked\r\n"
        b"\r\n"
        + format(len(c1), "x").encode() + b";ext=1\r\n" + c1 + b"\r\n"
        + format(len(c2), "X").encode() + b"\r\n" + c2 + b"\r\n"
        + format(len(c3), "x").encode() + b"\r\n" + c3 + b"\r\n"
        + b"0\r\n"
        b"X-Trailer: ignored\r\n"
        b"\r\n"
    )
    response_chunked = _record(
        "response",
        [
            "WARC-Date: " + date,
            "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000004>",
            "WARC-Target-URI: https://example.com/chunked",
            "Content-Type: application/http; msgtype=response",
        ],
        chunked_body,
    )

    metadata = _record(
        "metadata",
        [
            "WARC-Date: " + date,
            "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000005>",
            "WARC-Target-URI: https://example.com/chunked",
            "Content-Type: application/warc-fields",
        ],
        b"fetchTimeMs: 123\r\ncharset-detected: utf-8\r\n",
    )

    conversion = _record(
        "conversion",
        [
            "WARC-Date: " + date,
            "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000006>",
            "WARC-Target-URI: https://example.com/chunked",
            "Content-Type: text/plain",
        ],
        "chunk one and chunk two\né中\U0001f600 extracted text\n".encode(
            "utf-8"
        ),
    )

    records = [warcinfo, request, response_latin1, response_chunked,
               metadata, conversion]
    # one gzip member per record, mtime pinned for byte-stable output
    return b"".join(
        gzip.compress(r, compresslevel=9, mtime=0) for r in records
    )


if __name__ == "__main__":
    out = Path(__file__).parent / "cc_sample.warc.gz"
    out.write_bytes(build())
    print(f"wrote {out} ({out.stat().st_size} bytes)")
