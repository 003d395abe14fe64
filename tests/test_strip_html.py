"""strip_html (functions/text.py): pinned extractions, cross-engine
parity (the DuckDB side is ASSEMBLED FROM THE SAME pattern/entity
constants the Spark chain compiles — one definition), and composition
with the quality gate."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.functions.text import strip_html
from chess_lakehouse_spark.suite.llm import (
    HTML_STRIP_ORACLE,
    html_strip_sql,
    q_html_strip,
)

PINNED = [
    ("<p>Hello <b>world</b></p>", "Hello world"),
    ("a<SCRIPT type=x>var q=1;</script>b", "a b"),
    ("a<style>.c{color:red}</style>b", "a b"),
    ("x<!-- hidden\ncomment -->y", "x y"),
    ("A&amp;B &lt;tag&gt; it&#39;s &quot;q&quot;", 'A&B <tag> it\'s "q"'),
    # single-pass entity decode: &amp;lt; -> &lt; (NOT <)
    ("&amp;lt;", "&lt;"),
    ("line1<br/>line2\n\nline3", "line1 line2 line3"),
    # unclosed script: opening tag stripped, content survives
    ("a<script>alert(1) b", "a alert(1) b"),
    ("no markup at all", "no markup at all"),
    ("a&nbsp;b", "a b"),
    ("", ""),
]


# the DuckDB twin lives in suite/llm.py (html_strip_sql — assembled from
# the SAME constants the Spark chain compiles); this module IMPORTS it,
# the anti-divergence pattern.
_duckdb_strip_expr = html_strip_sql


@pytest.mark.parametrize("raw,want", PINNED)
def test_pinned_extractions(spark, raw, want):
    got = (
        spark.createDataFrame([(raw,)], "t string")
        .select(strip_html(F.col("t")).alias("o"))
        .first()["o"]
    )
    assert got == want


def test_cross_engine_fuzz(spark):
    """Composed markup-grammar fuzz: identical output through the Spark
    Column chain and through DuckDB evaluating the assembled twin."""
    rng = random.Random(20260814)
    frags = [
        "plain words here",
        "<p>", "</p>", "<b class='x'>", "<br/>",
        "<script>junk();</script>", "<style a=b>.x{}</style>",
        "<!--c-->", "<SCRIPT>UP</SCRIPT>",
        "&amp;", "&lt;", "&gt;", "&#39;", "&nbsp;", "&quot;", "&amp;lt;",
        "tail text", "\n", "\t", "  ", "a<b", "x > y",
        "<script>no close", "<div", "mid>",
    ]
    texts = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    got = {
        r["id"]: r["o"]
        for r in sdf.select("id", strip_html(F.col("t")).alias("o")).collect()
    }
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"id": range(len(texts)), "t": texts}))
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT id, {_duckdb_strip_expr('t')} AS o FROM u"
        ).fetchall()
    }
    con.close()
    assert got == want


def test_composes_with_quality_gate(spark):
    """The pipeline shape: markup-heavy junk scores low AFTER stripping
    only if the strip actually ran — stripped real prose keeps its words
    while raw markup would have polluted the token stream."""
    from chess_lakehouse_spark.functions.text import quality_score

    html = (
        "<html><body><p>the cat sat on the mat and the dog chased it "
        "around the yard for a while</p><script>var x=1;var y=2;</script>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "id long, t string")
    row = df.select(
        strip_html(F.col("t")).alias("clean"),
        quality_score(strip_html(F.col("t"))).alias("q_clean"),
        quality_score(F.col("t")).alias("q_raw"),
    ).first()
    assert "script" not in row["clean"] and "var x" not in row["clean"]
    assert row["clean"].startswith("the cat sat")
    assert row["q_clean"] != row["q_raw"]


def test_pipeline_cli_strip_html_flag(spark, tmp_path, capsys):
    """--stripHtml cleans markup before the gate: an HTML-wrapped doc is
    published with extracted text."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    body = " ".join("the of and word%d" % j for j in range(15))
    lines = [json.dumps({
        "doc_id": 1,
        "text": f"<html><p>{body}</p><script>var j;</script></html>",
        "lang": "en", "source": "s0",
    })]
    src = tmp_path / "in"
    src.mkdir()
    (src / "p.jsonl").write_text("\n".join(lines) + "\n")
    out = tmp_path / "out"
    pipeline_cli.main([
        "clean-corpus", "--inDir", str(src), "--outDir", str(out),
        "--minQuality", "0.0", "--evalFrac", "0.0", "--stripHtml",
    ])
    rows = spark.read.json(str(out / "corpus")).collect()
    assert len(rows) == 1
    assert rows[0].text == body


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_q_html_strip_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof for the r9 candidate: exact values,
    driver-safe types."""
    import duckdb as _duckdb

    sdf = q_html_strip(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == ["bigint", "string", "int"]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = _duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    drows = sorted(tuple(r) for r in con.execute(HTML_STRIP_ORACLE).fetchall())
    con.close()
    assert len(srows) > 0
    assert srows == drows


def test_q_html_strip_actually_strips(spark):
    rows = q_html_strip(spark, "/root/testdata/sf0.001").collect()
    assert all("<" not in r["clean_text"] for r in rows)
    assert all(r["clean_text"].endswith(" end") or " end" in r["clean_text"]
               for r in rows)
    assert all("tail&" in r["clean_text"] for r in rows)  # entity decoded


def test_adversarial_random_string_parity(spark):
    """Fully random printable strings (non-ASCII included, broken tags,
    stray entities): strip_html is anchor-free and \\b-free, so the
    Java/RE2 agreement must hold on arbitrary input."""
    import string as _string

    rng = random.Random(99)
    alph = (_string.ascii_letters + _string.digits
            + " .-_@#?&/<>:;%+=!'\"(){}[]|\\~^$*\t" + "éü…–")
    frags = ["<script>", "</script>", "<p>", "&amp;", "&lt;", "<!--", "-->",
             "<style", "</STYLE>", "<", ">"]
    texts = []
    for _ in range(1500):
        parts = [
            rng.choice(frags) if rng.random() < 0.4 else
            "".join(rng.choice(alph) for _ in range(rng.randint(0, 10)))
            for _ in range(rng.randint(1, 5))
        ]
        texts.append("".join(parts))
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    got = {
        r["id"]: r["o"]
        for r in sdf.select("id", strip_html(F.col("t")).alias("o")).collect()
    }
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"id": range(len(texts)), "t": texts}))
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT id, {_duckdb_strip_expr('t')} AS o FROM u"
        ).fetchall()
    }
    con.close()
    assert got == want
