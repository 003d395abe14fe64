"""Host link graph + PageRank (operators/graph.py: extract_links,
host_edges, pagerank): href extraction forms, host folding, and the
power-method fixpoint pinned against an independent NumPy reference."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.graph import (
    extract_links,
    host_edges,
    pagerank,
)


def _numpy_pagerank(edges, d, n_iter):
    import numpy as np

    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw: dict = defaultdict(float)
    for s, _, w in edges:
        outw[s] += w
    P = np.zeros((n, n))
    for s, t, w in edges:
        P[idx[t], idx[s]] += w / outw[s]
    dang_idx = [idx[v] for v in nodes if outw.get(v, 0) == 0]
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dang = r[dang_idx].sum()
        r = (1 - d) / n + d * (P @ r + dang / n)
    return dict(zip(nodes, r))


def _spark_pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    return {r.node: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_numpy_reference(spark):
    """Weighted digraph with a hub, a dangling sink, and asymmetric
    weights — Spark == NumPy power iteration at every node."""
    edges = [
        ("a", "b", 1.0), ("a", "c", 2.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("d", "c", 1.0),          # d is never linked-to
        ("b", "e", 1.0),                           # e is a dangling sink
    ]
    got = _spark_pr(spark, edges, damping=0.85, n_iter=15)
    want = _numpy_pagerank(edges, 0.85, 15)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the sink's received mass recirculates: the hub c outranks everyone
    assert got["c"] == max(got.values())


def test_pagerank_symmetric_cycle_is_uniform(spark):
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)]
    got = _spark_pr(spark, edges, n_iter=10)
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_pagerank_validation(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, weight double"
    )
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError, match="tol"):
        pagerank(df, tol=0.0)


def test_pagerank_early_stop_equals_fixed_iteration_at_tolerance(spark):
    """L1 early stop: pagerank(tol=t) must return EXACTLY the ranks of a
    fixed run with n_iter = the first step whose L1 delta is <= t (the
    check runs after the update, so it never alters the output), and it
    must genuinely stop early (fewer steps than the cap would take)."""
    import numpy as np

    edges = [
        ("a", "b", 1.0), ("a", "c", 2.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("d", "c", 1.0), ("b", "e", 1.0),
    ]
    d, tol, cap = 0.85, 1e-4, 50

    # derive the expected stop step k from the NumPy reference
    prev = _numpy_pagerank(edges, d, 0)
    k = None
    for step in range(1, cap + 1):
        cur = _numpy_pagerank(edges, d, step)
        delta = sum(abs(cur[v] - prev[v]) for v in cur)
        if delta <= tol:
            k = step
            break
        prev = cur
    assert k is not None and k < cap, "tolerance never reached below the cap"

    got = _spark_pr(spark, edges, damping=d, n_iter=cap, tol=tol)
    want = _spark_pr(spark, edges, damping=d, n_iter=k)
    assert got == want  # bit-identical, not approx: same steps, same algebra
    for v, r in _numpy_pagerank(edges, d, k).items():
        assert got[v] == pytest.approx(r, abs=1e-9), v


def test_extract_links_href_forms(spark):
    html = (
        '<a href="https://a.example/x">1</a> '
        "<a href='http://b.example/y'>2</a> "
        "<a HREF = https://c.example/z>3</a> "
        '<a href="/relative/skipped">4</a> '
        '<a href="ftp://skipped.example">5</a>'
    )
    df = spark.createDataFrame(
        [("https://src.example/p", html), ("https://src.example/q", None)],
        "url string, html string",
    )
    got = sorted(
        (r.src_url, r.dst_url)
        for r in extract_links(df, "url", "html").collect()
    )
    assert got == [
        ("https://src.example/p", "http://b.example/y"),
        ("https://src.example/p", "https://a.example/x"),
        ("https://src.example/p", "https://c.example/z"),
    ]


def test_host_edges_folding_and_self_loops(spark):
    links = spark.createDataFrame(
        [
            ("https://www.A.example/p1", "https://b.example/x"),
            ("https://a.example/p2", "https://B.example/y"),    # same pair
            ("https://a.example/p3", "https://www.a.example/q"),  # self-loop
        ],
        "src_url string, dst_url string",
    )
    got = [(r.src, r.dst, r.weight) for r in host_edges(links).collect()]
    assert got == [("a.example", "b.example", 2)]


def test_warc_to_pagerank_composition(spark, tmp_path):
    """End to end: WARC response records → response_documents →
    extract_links → host_edges → pagerank. The most-linked host wins."""
    import gzip

    from chess_lakehouse_spark.sources.warc import (
        read_warc,
        response_documents,
    )

    def rec(url, html):
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + html.encode()
        )
        head = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Record-ID: <urn:uuid:x>\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            "Content-Type: application/http\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        )
        return head.encode() + body + b"\r\n\r\n"

    raw = (
        rec("https://a.example/p", '<a href="https://hub.example/x">h</a>')
        + rec("https://b.example/p", '<a href="https://hub.example/y">h</a>')
        + rec("https://c.example/p", '<a href="https://hub.example/w">h</a>')
        + rec("https://hub.example/p", '<a href="https://a.example/z">a</a>')
    )
    (tmp_path / "crawl.warc.gz").write_bytes(gzip.compress(raw))
    docs = response_documents(
        read_warc(spark, f"{tmp_path}/*.warc.gz", ("response",))
    )
    ranks = {
        r.node: r["rank"]
        for r in pagerank(
            host_edges(extract_links(docs, "url", "html")), n_iter=40
        ).collect()
    }
    assert set(ranks) == {"a.example", "b.example", "c.example", "hub.example"}
    assert ranks["hub.example"] == max(ranks.values())


def test_pipeline_cli_rank_hosts_stage(spark, tmp_path, capsys):
    """rank-hosts over raw WARC response archives writes a (node, rank)
    parquet whose mass sums to 1."""
    import gzip
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    def rec(url, html):
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html.encode()
        )
        head = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Record-ID: <urn:uuid:x>\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            "Content-Type: application/http\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        )
        return head.encode() + body + b"\r\n\r\n"

    raw = (
        rec("https://a.example/p", '<a href="https://hub.example/x">h</a>')
        + rec("https://hub.example/p", '<a href="https://a.example/z">a</a>')
    )
    (tmp_path / "c.warc.gz").write_bytes(gzip.compress(raw))
    out = str(tmp_path / "ranks")
    pipeline_cli.main([
        "rank-hosts", "--inDir", f"{tmp_path}/*.warc.gz", "--outDir", out,
        "--iterations", "8",
    ])
    ranks = {r.node: r["rank"] for r in spark.read.parquet(out).collect()}
    assert set(ranks) == {"a.example", "hub.example"}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_clean_corpus_host_rank_gate(spark, tmp_path):
    """--hostRanksParquet drops docs from known low-ranked hosts; unknown
    hosts keep (the NULL-keep convention)."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    spark.createDataFrame(
        [("good.example", 0.6), ("spam.example", 0.01)],
        "node string, rank double",
    ).write.parquet(str(tmp_path / "ranks"))

    lines = []
    hosts = {0: "good.example", 1: "spam.example", 2: "unranked.example"}
    for i in range(6):
        text = " ".join(f"h{i}tok{j}" for j in range(40))
        lines.append(json.dumps({
            "doc_id": i, "text": text, "lang": "en", "source": "s0",
            "url": f"https://{hosts.get(i, f'site{i}.example')}/p{i}",
        }))
    src = tmp_path / "in"
    src.mkdir()
    (src / "p.jsonl").write_text("\n".join(lines) + "\n")
    out = tmp_path / "out"
    pipeline_cli.main([
        "clean-corpus", "--inDir", str(src), "--outDir", str(out),
        "--urlCol", "url",
        "--hostRanksParquet", str(tmp_path / "ranks"),
        "--minHostRank", "0.1",
        "--minQuality", "-99", "--threshold", "0.5", "--evalFrac", "0.3",
    ])
    ids = sorted(r.doc_id for r in spark.read.json(str(out / "corpus")).collect())
    assert ids == [0, 2, 3, 4, 5]  # only doc 1 (known low-rank host) drops
