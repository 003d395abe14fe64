"""Staged unigram LM (functions/text.py: build_lm / lm_score_from) — the
CCNet train-once/score-many split with exact-integer add-1/2 OOV
smoothing. The r9 staging candidate q_lm_staged is exercised exactly as
the driver would run it, against the suite-defined LM_STAGED_ORACLE
(imported from suite/llm.py — one definition, the anti-divergence
pattern)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.functions.text import build_lm, lm_score_from
from chess_lakehouse_spark.suite.llm import LM_STAGED_ORACLE, q_lm_staged

TRAIN = [
    (0, "the cat sat on the mat"),
    (1, "the dog chased the cat"),
    (2, "a mat for a cat"),
]
SCORE = [
    (10, "the cat on the mat"),          # fully in-vocabulary
    (11, "quantum the lattice cat"),     # 2 OOV tokens
    (12, "zz yy xx"),                    # all OOV
]


def _ref_scores():
    counts: dict[str, int] = {}
    for _, t in TRAIN:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    vocab = len(counts)
    out = {}
    for i, t in SCORE:
        toks = t.split()
        lps = [
            round(math.log((2 * counts.get(w, 0) + 1) / (2 * total + vocab)), 6)
            for w in toks
        ]
        s6 = sum(round(lp * 1_000_000) for lp in lps)
        n = len(toks)
        # integer half-away mean at scale 6, negated
        m6 = (2 * (-s6) + n) // (2 * n) if s6 < 0 else -((2 * s6 + n) // (2 * n))
        out[i] = (n, sum(1 for w in toks if w not in counts), m6 / 1_000_000)
    return out


def test_staged_lm_matches_python_reference(spark, tmp_path):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    lm = str(tmp_path / "lm")
    build_lm(train, "text", lm)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["nll"])
        for r in lm_score_from(spark, lm, score, "doc_id", "text").collect()
    }
    assert got == _ref_scores()


def test_staged_lm_oov_monotonicity(spark, tmp_path):
    """More OOV mass -> higher nll: the filtering signal actually orders
    in-distribution above out-of-distribution text."""
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    lm = str(tmp_path / "lm")
    build_lm(train, "text", lm)
    nll = {
        r["doc_id"]: r["nll"]
        for r in lm_score_from(spark, lm, score, "doc_id", "text").collect()
    }
    assert nll[10] < nll[11] < nll[12]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_q_lm_staged_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof for the r9 candidate: the suite query
    against the suite oracle, exact values, driver-safe types."""
    sdf = q_lm_staged(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == ["bigint", "bigint", "bigint", "double"]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    drows = sorted(tuple(r) for r in con.execute(LM_STAGED_ORACLE).fetchall())
    con.close()
    assert len(srows) > 0
    assert srows == drows


def test_staged_lm_tables_are_exact(spark, tmp_path):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    lm = str(tmp_path / "lm")
    build_lm(train, "text", lm)
    stats = spark.read.parquet(f"{lm}/stats").first()
    n_tokens = sum(len(t.split()) for _, t in TRAIN)
    n_vocab = len({w for _, t in TRAIN for w in t.split()})
    assert stats["total"] == n_tokens and stats["vocab"] == n_vocab


def test_append_lm_equals_full_rebuild(spark, tmp_path):
    """Integer counts merge losslessly: build on part A then append part
    B must equal a full rebuild — terms, stats, and every score."""
    from chess_lakehouse_spark.functions.text import append_lm

    extra = [(20, "the mat and the lattice"), (21, "cat cat quantum")]
    part_a = spark.createDataFrame(TRAIN, "doc_id long, text string")
    part_b = spark.createDataFrame(extra, "doc_id long, text string")
    full = part_a.unionByName(part_b)
    score = spark.createDataFrame(SCORE, "doc_id long, text string")

    inc = str(tmp_path / "lm_inc")
    build_lm(part_a, "text", inc)
    append_lm(part_b, "text", inc)
    ref = str(tmp_path / "lm_full")
    build_lm(full, "text", ref)

    t_inc = sorted(tuple(r) for r in spark.read.parquet(f"{inc}/terms").collect())
    t_ref = sorted(tuple(r) for r in spark.read.parquet(f"{ref}/terms").collect())
    assert t_inc == t_ref
    assert spark.read.parquet(f"{inc}/stats").first() == \
        spark.read.parquet(f"{ref}/stats").first()
    s_inc = sorted(tuple(r) for r in lm_score_from(spark, inc, score, "doc_id", "text").collect())
    s_ref = sorted(tuple(r) for r in lm_score_from(spark, ref, score, "doc_id", "text").collect())
    assert s_inc == s_ref
