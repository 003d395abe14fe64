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


# ------------------------------------------------- staged Misra-Gries state


def _exact_counts(spark, rows):
    from collections import Counter

    return Counter(t for (t,) in rows if t is not None)


def test_mg_staged_lifecycle_bounds_and_retention(spark, tmp_path):
    """Batches staged with write_mg_batch serve a merged summary with
    the GLOBAL Mergeable-Summaries guarantee: est <= true over the
    union corpus, true - est <= N/(k+1) with N from mg_state_total,
    and every term above N/(k+1) present — for both partial builders."""
    from chess_lakehouse_spark.operators.sketches import (
        mg_batch_partial,
        mg_from_batches,
        mg_state_total,
        write_mg_batch,
    )

    k = 6
    b1 = [("a",)] * 120 + [("b",)] * 60 + [(f"x{i}",) for i in range(40)]
    b2 = [("a",)] * 80 + [("c",)] * 70 + [(f"y{i}",) for i in range(30)]
    b3 = [("b",)] * 90 + [(None,)] * 5 + [(f"z{i}",) for i in range(25)]
    state = str(tmp_path / "mg_state")
    for exact in (True, False):
        d = f"{state}_{exact}"
        for bid, rows in (("d1", b1), ("d2", b2), ("d3", b3)):
            df = spark.createDataFrame(rows, "term string").repartition(3)
            write_mg_batch(mg_batch_partial(df, "term", k, exact=exact), d, bid)
        n = mg_state_total(spark, d)
        true = _exact_counts(spark, b1 + b2 + b3)
        assert n == sum(true.values())
        served = {r["term"]: r["est"] for r in mg_from_batches(spark, d, k).collect()}
        assert 0 < len(served) <= k
        for t, est in served.items():
            assert 0 < est <= true[t], (exact, t)
            assert (true[t] - est) * (k + 1) <= n, (exact, t)
        # retention: every term with true > N/(k+1) is guaranteed served
        for t, c in true.items():
            if c * (k + 1) > n:
                assert t in served, (exact, t)


def test_mg_staged_replay_is_value_identical_for_exact_partials(spark, tmp_path):
    """A crash-replayed batch republishes its own partition
    value-identically under the default deterministic (exact) partial:
    the served summary is unchanged by the replay."""
    from chess_lakehouse_spark.operators.sketches import (
        mg_batch_partial,
        mg_from_batches,
        mg_state_total,
        write_mg_batch,
    )

    k = 4
    state = str(tmp_path / "mg_replay")
    b1 = [("a",)] * 50 + [("b",)] * 20 + [(f"t{i}",) for i in range(10)]
    b2 = [("b",)] * 40 + [("c",)] * 30
    df1 = spark.createDataFrame(b1, "term string")
    df2 = spark.createDataFrame(b2, "term string")
    write_mg_batch(mg_batch_partial(df1, "term", k), state, 1)
    write_mg_batch(mg_batch_partial(df2, "term", k), state, 2)
    before = sorted(tuple(r) for r in mg_from_batches(spark, state, k).collect())
    n_before = mg_state_total(spark, state)
    # replay batch 2 (different partitioning of the same data)
    write_mg_batch(mg_batch_partial(df2.repartition(7), "term", k), state, 2)
    after = sorted(tuple(r) for r in mg_from_batches(spark, state, k).collect())
    assert after == before
    assert mg_state_total(spark, state) == n_before


def test_mg_all_pruned_batch_still_carries_its_mass(spark, tmp_path):
    """The mass-carrier row: a batch of > k equal-count terms prunes
    every counter away, but its n_batch must still widen the served
    error bound — dropping it would claim an anti-conservatively tight
    guarantee."""
    from chess_lakehouse_spark.operators.sketches import (
        mg_batch_partial,
        mg_from_batches,
        mg_state_total,
        write_mg_batch,
    )

    k = 3
    state = str(tmp_path / "mg_carrier")
    heavy = spark.createDataFrame([("a",)] * 10, "term string")
    flat = spark.createDataFrame([(f"u{i}",) for i in range(8)], "term string")
    p = mg_batch_partial(flat, "term", k)
    # the flat batch prunes to carrier-only (4+ equal counts, k = 3)
    assert [r["term"] for r in p.collect()] == [None]
    write_mg_batch(mg_batch_partial(heavy, "term", k), state, "h")
    write_mg_batch(p, state, "f")
    assert mg_state_total(spark, state) == 18
    served = {r["term"]: r["est"] for r in mg_from_batches(spark, state, k).collect()}
    assert served == {"a": 10}


def test_mg_serve_k_validated_against_ingest_k(spark, tmp_path):
    """Every partial records its ingest k; serving with a LARGER k must
    raise (the partials only support an error bound of N/(k_ingest+1) —
    a k=50 serve over k=5 partials would print a bound ten times
    tighter than the state guarantees). Serving with a smaller k stays
    legal: the merge prunes further, the claimed bound is looser."""
    import pytest

    from chess_lakehouse_spark.operators.sketches import (
        mg_batch_partial,
        mg_from_batches,
        write_mg_batch,
    )

    state = str(tmp_path / "mg_kcheck")
    df = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 20 + [("c",)] * 10, "term string"
    )
    write_mg_batch(mg_batch_partial(df, "term", 5), state, 1)
    write_mg_batch(mg_batch_partial(df, "term", 8), state, 2)
    # min ingest k is 5: k=5 and smaller serve fine, k=6 must refuse
    assert mg_from_batches(spark, state, 5).count() >= 1
    assert mg_from_batches(spark, state, 2).count() >= 1
    with pytest.raises(ValueError, match="smallest ingest k=5"):
        mg_from_batches(spark, state, 6)
