"""Mergeable HLL corpus-accounting sketches: accuracy vs exact counts,
the merge algebra (union of stored sketches == sketch of concatenated
data), persistence round-trip through Parquet binary columns, and the
daily-novelty shape. Rows-only class (like approx_stats): DuckDB's HLL
is a different implementation, so no SQL oracle applies — accuracy is
pinned against exact distinct counts instead."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.sketches import (
    content_sketches,
    novelty_estimate,
    overlap_estimates,
    union_estimate,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_sketch_estimates_track_exact_counts(spark):
    docs = _docs(spark)
    sk = content_sketches(docs, ["source"], "text").collect()
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.count_distinct(F.md5("text")).alias("n"))
        .collect()
    }
    assert {r["source"] for r in sk} == set(exact)
    for r in sk:
        assert r["est_distinct"] == pytest.approx(exact[r["source"]], rel=0.05)
        assert r["n_rows"] >= r["est_distinct"] * 0.9


def test_union_of_stored_sketches_matches_one_pass(spark):
    """The merge property the incremental design rests on: unioning
    per-source sketches estimates the same global distinct count as
    sketching the whole corpus in one pass. (Union is in the same
    accuracy class, not bit-identical — the union operator carries its
    own HLL state path; measured here: 496 vs 501 vs exact 500.)"""
    docs = _docs(spark)
    per_source = content_sketches(docs, ["source"], "text")
    merged = union_estimate(per_source)
    one_pass = content_sketches(
        docs.withColumn("all", F.lit(1)), ["all"], "text"
    ).first()["est_distinct"]
    exact = docs.select(F.md5("text")).distinct().count()
    assert merged == pytest.approx(one_pass, rel=0.05)
    assert merged == pytest.approx(exact, rel=0.05)
    assert one_pass == pytest.approx(exact, rel=0.05)


def test_sketches_round_trip_through_parquet(spark, tmp_path):
    """The sketch column persists as lake binary and keeps answering —
    the store-once/ask-forever artifact."""
    docs = _docs(spark)
    path = str(tmp_path / "sketches")
    content_sketches(docs, ["source"], "text").write.parquet(path)
    back = spark.read.parquet(path)
    assert union_estimate(back) == union_estimate(
        content_sketches(docs, ["source"], "text")
    )


def test_overlap_matrix_identity_and_disjoint(spark):
    docs = _docs(spark)
    # planted overlap: b = a's content under another key + disjoint c
    a = docs.select(F.lit("a").alias("k"), "text")
    b = docs.select(F.lit("b").alias("k"), "text")  # 100% overlap with a
    c = docs.select(
        F.lit("c").alias("k"), F.concat(F.lit("DISJOINT "), "text").alias("text")
    )
    sk = content_sketches(a.unionByName(b).unionByName(c), ["k"], "text")
    est = {
        (r["key_a"], r["key_b"]): r
        for r in overlap_estimates(sk, "k").collect()
    }
    ab = est[("a", "b")]
    assert ab["est_overlap"] == pytest.approx(ab["est_a"], rel=0.05)
    ac = est[("a", "c")]
    assert ac["est_overlap"] <= 0.05 * ac["est_a"]  # ~disjoint


def test_daily_novelty_from_sketches(spark):
    """Day-2 drop = half replayed content + half new: novelty estimated
    from stored sketches alone lands on the new half."""
    docs = _docs(spark)
    day1 = content_sketches(docs, ["source"], "text")
    replay = docs.where(F.col("doc_id") % 2 == 0)
    fresh = docs.where(F.col("doc_id") % 2 == 1).withColumn(
        "text", F.concat(F.lit("NEW "), "text")
    )
    day2 = content_sketches(replay.unionByName(fresh), ["source"], "text")
    est = novelty_estimate(day2, day1)
    exact_new = fresh.select(F.md5("text")).distinct().count()
    assert est["est_novel"] == pytest.approx(exact_new, rel=0.1)
    assert est["est_union"] == pytest.approx(
        est["est_corpus"] + exact_new, rel=0.05
    )
