"""Corpus-grain k-shingle overlap matrix (operators/dedup.py:
corpus_overlap_matrix): planted-overlap exactness, set (not multiset)
semantics, complete-grid/zero-pair behavior, and the staged gating
candidate's two-scale oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.dedup import corpus_overlap_matrix


def _mat(df, **kw):
    return {
        (r.g1, r.g2): r
        for r in corpus_overlap_matrix(df, "source", "text", **kw).collect()
    }


def test_planted_overlap_exact(spark):
    """Hand-countable shingle sets: A has {ab bc cd}? No — k=3 windows.
    A: 'a b c d' -> {'a b c', 'b c d'}; B: 'b c d e' -> {'b c d', 'c d e'};
    C: 'x y z' -> {'x y z'}. A∩B = {'b c d'} -> jaccard 1/3."""
    rows = [
        (1, "A", "a b c d"),
        (2, "B", "b c d e"),
        (3, "C", "x y z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    m = _mat(df)
    assert set(m) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = m[("A", "B")]
    assert (ab.n1, ab.n2, ab.shared) == (2, 2, 1)
    assert ab.jaccard == pytest.approx(1 / 3, abs=5e-7)
    assert round(ab.jaccard, 6) == 0.333333  # half-away 6-decimal contract
    ac = m[("A", "C")]
    assert (ac.shared, ac.jaccard) == (0, 0.0)


def test_set_semantics_and_short_docs(spark):
    """Duplicated shingles count once per group; docs shorter than k and
    NULL text contribute nothing; a group with no shingles yields NULL
    jaccard against another empty group, 0.0 against a non-empty one."""
    rows = [
        (1, "A", "a b c"),
        (2, "A", "a b c"),        # same shingle again: set, not multiset
        (3, "A", "a b"),          # too short
        (4, "B", None),           # NULL text
        (5, "C", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    m = _mat(df)
    a_b = m[("A", "B")]
    assert (a_b.n1, a_b.n2, a_b.shared, a_b.jaccard) == (1, 0, 0, 0.0)
    b_c = m[("B", "C")]
    assert (b_c.n1, b_c.n2, b_c.shared) == (0, 0, 0)
    assert b_c.jaccard is None


def test_total_overlap_is_one(spark):
    rows = [(1, "A", "p q r s"), (2, "B", "p q r s")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    assert _mat(df)[("A", "B")].jaccard == 1.0


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_corpus_overlap_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof: exact values, driver-safe types, both
    local scales; the fixture's shared template vocabulary guarantees
    non-trivial (0 < jaccard < 1) overlap on every pair."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import (
        CORPUS_OVERLAP_ORACLE,
        q_corpus_overlap,
    )

    sdf = q_corpus_overlap(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == [
        "string", "string", "bigint", "bigint", "bigint", "double",
    ]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rel = con.sql(CORPUS_OVERLAP_ORACLE)
    assert all(
        str(t) in {"BIGINT", "VARCHAR", "DOUBLE"} for t in rel.types
    ), [str(t) for t in rel.types]
    drows = sorted(tuple(r) for r in con.execute(CORPUS_OVERLAP_ORACLE).fetchall())
    con.close()
    assert len(srows) > 1
    assert all(0 < r[5] < 1 for r in srows)  # non-trivial on every pair
    assert srows == drows
