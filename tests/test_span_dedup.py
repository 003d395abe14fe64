"""Duplicate-span (ExactSubstr-style) dedup: pinned against a pure-Python
reference and the canonical DuckDB oracle template, which lives in
suite/llm.py (promoted at r8 registration; this file imports it so engine
test and gated oracle cannot diverge)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.dedup import duplicate_span_dedup
from chess_lakehouse_spark.suite.llm import SPAN_DEDUP_ORACLE_TPL

_WS = re.compile(r"[ \t\n\r\f\x0b]+")


def _py_span_dedup(docs, k):
    toks = {i: [t for t in _WS.split(text) if t] for i, text in docs}
    first, marked = {}, []
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            key = " ".join(ts[p : p + k])
            if key not in first:
                first[key] = (i, p)
            else:
                marked.append((i, p))
    covered = {(i, p + j) for (i, p) in marked for j in range(k)}
    out = {}
    for i, ts in toks.items():
        kept = [t for p, t in enumerate(ts) if (i, p) not in covered]
        out[i] = (" ".join(kept), len(ts), sum((i, p) in covered for p in range(len(ts))))
    return out


DOCS = [
    (0, "alpha beta gamma delta epsilon zeta unique tail here"),
    (1, "prefix words alpha beta gamma delta epsilon zeta more stuff"),  # 6-token copy
    (2, "alpha beta gamma delta epsilon zeta"),                          # fully duplicated
    (3, "totally fresh content with no repeats at all"),
    (4, "x y alpha beta gamma delta epsilon zeta z"),                    # mid-doc copy
    (5, ""),                                                             # zero tokens
]


def test_span_dedup_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed_tokens"])
        for r in duplicate_span_dedup(df, "doc_id", "text", k=5).collect()
    }
    assert got == _py_span_dedup(DOCS, 5)
    # doc 0 keeps everything (it IS the first occurrence)
    assert got[0][2] == 0
    # doc 2 is erased entirely
    assert got[2] == ("", 6, 6)
    # doc 5 (empty) survives as an empty row, not a dropped one
    assert got[5] == ("", 0, 0)
    # doc 1 lost its copied span but kept its unique prefix/suffix
    assert got[1][0].startswith("prefix words") and got[1][2] >= 5


def test_span_dedup_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, duplicate_span_dedup(df, "doc_id", "text", k=3).collect()))
    b = sorted(
        map(
            tuple,
            duplicate_span_dedup(df.repartition(7), "doc_id", "text", k=3).collect(),
        )
    )
    assert a == b
    with pytest.raises(ValueError, match="k must be"):
        duplicate_span_dedup(df, "doc_id", "text", k=1)


def test_span_dedup_duckdb_oracle_parity(spark):
    """Engine vs the staged DuckDB oracle on the real fixture corpus —
    k=3 over the token-soup fixture text, where 3-grams do repeat across
    documents, so removal actually fires."""
    import duckdb

    k = 3
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed_tokens"])
        for r in duplicate_span_dedup(docs, "doc_id", "text", k=k).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    duck = {
        i: (c, nt, nr)
        for i, c, nt, nr in con.execute(
            SPAN_DEDUP_ORACLE_TPL.format(k=k)
        ).fetchall()
    }
    assert duck == got
    assert any(v[2] > 0 for v in got.values())  # spans actually removed


def test_span_dedup_order_col_controls_first_occurrence(spark):
    """Without order_col, 'earlier' is (id, pos) order — doc 0 wins; with
    an ingestion-order column that reverses the ids, doc 1 wins and doc 0
    loses its copy of the span instead."""
    rows = [
        (0, 2, "alpha beta gamma delta epsilon tail0"),
        (1, 1, "alpha beta gamma delta epsilon tail1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ingest_seq long, text string")
    by_id = {
        r["doc_id"]: r["n_removed_tokens"]
        for r in duplicate_span_dedup(df, "doc_id", "text", k=5).collect()
    }
    assert by_id == {0: 0, 1: 5}
    by_seq = {
        r["doc_id"]: r["n_removed_tokens"]
        for r in duplicate_span_dedup(
            df, "doc_id", "text", k=5, order_col="ingest_seq"
        ).collect()
    }
    assert by_seq == {0: 5, 1: 0}


def test_span_dedup_null_text_survives(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed_tokens"])
        for r in duplicate_span_dedup(df, "doc_id", "text", k=3).collect()
    }
    assert got[1] == ("", 0, 0)
