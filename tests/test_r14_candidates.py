"""Staging tests for the r13/r14 window candidates built in the r12
build session's second batch (suite/llm.py STAGED_CANDIDATES):
two-scale exact parity against their suite-defined DuckDB oracles,
driver-safe output types, plan-shape guards, and operator-level
semantics pins.

- heavy_hitters — Misra-Gries heavy hitters through the
  driver-checkable projection (Agarwal et al., "Mergeable Summaries",
  PODS 2012): exact counts for every term the sketch guarantees to
  retain plus guarantee booleans; the raw summary's bounds are
  property-pinned here across partitioning layouts (counter values are
  order-dependent; the BOUNDS are not).
- lsh_recall — the measured MinHash-LSH S-curve: recall/leakage of the
  production candidate-generation stage against the lossless
  shingle-inverted-index ground truth, per similarity bucket.
- stream_sessionize — native session_window aggregation drained END TO
  END through Structured Streaming (watermark + append parquet sink);
  the oracle is batch gaps-and-islands sessionization. The exact-gap
  boundary (event at precisely `gap` after the previous one EXTENDS
  the session) is pinned against a crafted frame.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _oracle_rows(sf_dir: str, tables: list[str], sql: str):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    con.close()
    return rows


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------ heavy_hitters


@pytest.mark.parametrize("sf_dir", SCALES)
def test_heavy_hitters_candidate_matches_oracle_two_scales(spark, sf_dir):
    from chess_lakehouse_spark.suite.llm import HEAVY_HITTERS_ORACLE, q_heavy_hitters

    sdf = q_heavy_hitters(spark, sf_dir)
    assert dict(sdf.dtypes) == {
        "term": "string",
        "true_cnt": "bigint",
        "in_sketch": "boolean",
        "within_bound": "boolean",
    }
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["documents"], HEAVY_HITTERS_ORACLE)
    # the guarantee booleans are the gate: every row TRUE, <= k rows
    from chess_lakehouse_spark.suite.llm import MG_K

    assert all(r[2] and r[3] for r in srows)
    assert len(srows) <= MG_K


def test_mg_sketch_bounds_hold_across_partitionings(spark):
    """Counter VALUES are partitioning-dependent; the two Misra-Gries
    BOUNDS (est <= true; true - est <= N/(k+1); every term above the
    retention threshold present) hold for EVERY layout — pinned over
    1, 3, and 16 partitions on a skewed frame."""
    from chess_lakehouse_spark.operators.sketches import mg_sketch

    rows = (
        [("a",)] * 400 + [("b",)] * 200 + [("c",)] * 90
        + [(f"t{i}",) for i in range(310)]
    )
    df = spark.createDataFrame(rows, "term string")
    n = len(rows)
    k = 9
    true = {"a": 400, "b": 200, "c": 90}
    for parts in (1, 3, 16):
        sk = {
            r["term"]: r["est"]
            for r in mg_sketch(df.repartition(parts), "term", k).collect()
        }
        assert len(sk) <= k
        for t, est in sk.items():
            tc = true.get(t, 1)
            assert 0 < est <= tc, (parts, t, est)
            assert (tc - est) * (k + 1) <= n, (parts, t, est)
        # retention guarantee: true_cnt > N/(k+1) = 100 -> must be present
        assert "a" in sk and "b" in sk


def test_mg_sketch_rejects_bad_k_and_ignores_nulls(spark):
    from chess_lakehouse_spark.operators.sketches import mg_sketch

    df = spark.createDataFrame([("a",), (None,), ("a",)], "term string")
    with pytest.raises(ValueError, match="k must be >= 1"):
        mg_sketch(df, "term", 0)
    got = {r["term"]: r["est"] for r in mg_sketch(df, "term", 4).collect()}
    assert got == {"a": 2}  # NULLs are not countable items
    # empty input (and therefore empty Arrow partitions) is a valid corpus
    empty = spark.createDataFrame([], "term string")
    assert mg_sketch(empty, "term", 4).collect() == []


def test_heavy_hitters_audit_is_all_true_and_bounded(spark):
    from chess_lakehouse_spark.operators.sketches import heavy_hitters_audit

    rows = [("x",)] * 50 + [("y",)] * 30 + [(f"z{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "term string")
    out = heavy_hitters_audit(df.repartition(5), "term", 4)
    got = sorted(tuple(r) for r in out.collect())
    # N = 100, k+1 = 5 -> threshold 20: x (50) and y (30) qualify
    assert got == [("x", 50, True, True), ("y", 30, True, True)]


def test_heavy_hitters_plan_is_arrow_not_row_python(spark):
    from chess_lakehouse_spark.suite.llm import q_heavy_hitters

    plan = _plan(q_heavy_hitters(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "MapInPandas" in plan  # the sketch pass is Arrow-batched


# --------------------------------------------------------------- lsh_recall


@pytest.mark.parametrize("sf_dir", SCALES)
def test_lsh_recall_candidate_matches_oracle_two_scales(spark, sf_dir):
    from chess_lakehouse_spark.suite.llm import LSH_RECALL_ORACLE, q_lsh_recall

    sdf = q_lsh_recall(spark, sf_dir)
    assert dict(sdf.dtypes) == {
        "bucket_lo_ppm": "bigint",
        "n_exact": "bigint",
        "n_found": "bigint",
        "recall_ppm": "bigint",
    }
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["documents"], LSH_RECALL_ORACLE)
    by_bucket = {r[0]: r for r in srows}
    # the fixture's true near-dups (>= 0.8 Jaccard) are all caught: the
    # 4-band/2-row geometry at J >= 0.8 has candidate-miss probability
    # (1 - J^2)^4 <= 0.017 per pair and the fixtures pin full recall
    for b, (_lo, n_exact, n_found, recall) in by_bucket.items():
        assert n_found <= n_exact
        if b >= 800_000:
            assert recall == 1_000_000
    # the low end exists and leaks only a tiny candidate fraction
    assert 0 in by_bucket and by_bucket[0][3] < 10_000


def test_exact_jaccard_pairs_ppm_matches_bruteforce(spark):
    """Ground-truth side pinned against an in-driver brute force on a
    crafted corpus (shared-shingle blocking is lossless for J > 0)."""
    from chess_lakehouse_spark.operators.dedup import exact_jaccard_pairs_ppm

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a lazy dog"),
        (3, "completely different words entirely here now"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "xx"),  # < 3 tokens: no shingles
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_ppm"]
        for r in exact_jaccard_pairs_ppm(df, "doc_id", "text", k=3,
                                         threshold_ppm=1).collect()
    }

    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = sh(docs[i][1]), sh(docs[j][1])
            if a & b:
                want[(docs[i][0], docs[j][0])] = (
                    len(a & b) * 1_000_000 // len(a | b)
                )
    assert got == want
    assert got[(1, 4)] == 1_000_000  # identical docs
    assert (1, 3) not in got  # zero overlap never appears


def test_lsh_recall_report_bucket_math_and_ignores_extras(spark):
    from chess_lakehouse_spark.operators.dedup import lsh_recall_report

    exact = spark.createDataFrame(
        [(1, 2, 950_000), (1, 3, 910_000), (2, 3, 450_000), (4, 5, 120_000)],
        "id_a long, id_b long, jaccard_ppm long",
    )
    # found: one true pair, one below-floor extra pair (must be ignored)
    found = spark.createDataFrame(
        [(1, 2, 0.95), (7, 8, 0.9)], "id_a long, id_b long, jaccard double"
    )
    got = sorted(tuple(r) for r in lsh_recall_report(exact, found).collect())
    assert got == [
        (100_000, 1, 0, 0),
        (400_000, 1, 0, 0),
        (900_000, 2, 1, 500_000),
    ]
    with pytest.raises(ValueError, match="bucket_ppm"):
        lsh_recall_report(exact, found, bucket_ppm=0)


def test_lsh_recall_plan_never_all_pairs(spark):
    from chess_lakehouse_spark.suite.llm import q_lsh_recall

    plan = _plan(q_lsh_recall(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# -------------------------------------------------------- stream_sessionize


@pytest.mark.parametrize("sf_dir", SCALES)
def test_stream_sessionize_candidate_matches_oracle_two_scales(spark, sf_dir):
    """The session_window streaming plan — drained through a real
    watermarked availableNow run into a parquet sink — equals batch
    gaps-and-islands sessionization (stream == batch for complete
    input; the far-future sentinel advances the watermark past every
    real session so append mode emits them all)."""
    from chess_lakehouse_spark.suite.llm import (
        STREAM_SESSIONIZE_ORACLE,
        q_stream_sessionize,
    )

    sdf = q_stream_sessionize(spark, sf_dir)
    assert dict(sdf.dtypes) == {
        "user_id": "bigint",
        "session_start_us": "bigint",
        "session_end_us": "bigint",
        "n_events": "bigint",
    }
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["events"], STREAM_SESSIONIZE_ORACLE)
    # window bounds are coherent: end = last event + gap >= start + gap
    for _u, s_us, e_us, n in srows:
        assert e_us >= s_us + 1800 * 1_000_000
        assert n >= 1
    # re-invocation (bench reps / verify): fresh checkpoint per run
    again = sorted(tuple(r) for r in q_stream_sessionize(spark, sf_dir).collect())
    assert again == srows


def test_stream_sessionize_agrees_with_batch_sessionize_counts(spark):
    """Cross-pin of the two gated session definitions: per-user session
    COUNTS from the streaming window equal the gated batch `sessionize`
    query (same 30-minute gap, same `diff > gap` boundary)."""
    from chess_lakehouse_spark.suite.core import q_sessionize
    from chess_lakehouse_spark.suite.llm import q_stream_sessionize

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: r["n"]
        for r in q_stream_sessionize(spark, sf)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {r["user_id"]: r["n_sessions"] for r in q_sessionize(spark, sf).collect()}
    assert got == want


def test_session_window_exact_gap_boundary_extends_session(spark, tmp_path):
    """The boundary the oracle encodes, pinned against Spark itself: an
    event exactly `gap` after the previous one EXTENDS the session
    (Spark merges touching session ranges — same as the batch
    `diff > gap` new-session rule), one microsecond past `gap` starts a
    new session, and window end = last event + gap."""
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:30:00"),          # exactly gap: same session
        (2, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:30:00.000001"),   # gap + 1us: new session
    ]
    feed = str(tmp_path / "feed")
    (
        spark.createDataFrame(rows, "user_id long, ts_s string")
        .select("user_id", F.to_timestamp("ts_s").alias("ts"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(feed)
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(feed)
        .groupBy(F.session_window("ts", "1800 seconds").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("s_us"),
            F.unix_micros("sw.end").alias("e_us"),
            "n",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ssess_boundary")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.table("ssess_boundary").collect())
    base = 1704067200000000  # 2024-01-01 00:00:00 UTC in micros
    gap = 1800 * 1_000_000
    assert got == [
        (1, base, base + 2 * gap, 2),          # merged: end = last + gap
        (2, base, base + gap, 1),
        (2, base + gap + 1, base + 2 * gap + 1, 1),
    ]


@pytest.mark.parametrize("sf_dir", SCALES)
def test_heavy_hitters_staged_candidate_matches_oracle_two_scales(spark, sf_dir):
    """The staged lifecycle (3 ingest batches -> write_mg_batch ->
    mg_from_batches serve, N from mg_state_total) passes the SAME audit
    as the single-pass sketch — against HEAVY_HITTERS_ORACLE verbatim,
    the serving-layout-may-never-change-the-verdict discipline."""
    from chess_lakehouse_spark import suite
    from chess_lakehouse_spark.suite.llm import (
        HEAVY_HITTERS_ORACLE,
        q_heavy_hitters_staged,
    )

    # promoted at the r15 window re-plan: the REGISTERED entry pins the
    # verbatim oracle share (was the STAGED_CANDIDATES manifest pre-r15)
    assert suite.ORACLES["heavy_hitters_staged"] is HEAVY_HITTERS_ORACLE

    sdf = q_heavy_hitters_staged(spark, sf_dir)
    assert dict(sdf.dtypes) == {
        "term": "string",
        "true_cnt": "bigint",
        "in_sketch": "boolean",
        "within_bound": "boolean",
    }
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["documents"], HEAVY_HITTERS_ORACLE)
    assert all(r[2] and r[3] for r in srows)
    # re-invocation replays every batch partition value-identically
    # (deterministic exact partials) — the served audit is unchanged
    again = sorted(tuple(r) for r in q_heavy_hitters_staged(spark, sf_dir).collect())
    assert again == srows


@pytest.mark.parametrize("sf_dir", SCALES)
def test_stream_dedup_watermark_candidate_matches_oracle_two_scales(spark, sf_dir):
    """The built-in dropDuplicatesWithinWatermark operator — drained end
    to end over the DOUBLED events feed (at-least-once delivery) —
    collapses exactly back to the original events (stream == batch when
    every duplicate lands inside the watermark window and copies are
    value-identical)."""
    from chess_lakehouse_spark.suite.llm import (
        STREAM_DEDUP_WATERMARK_ORACLE,
        q_stream_dedup_watermark,
    )

    sdf = q_stream_dedup_watermark(spark, sf_dir)
    assert dict(sdf.dtypes) == {
        "event_id": "bigint",
        "user_id": "bigint",
        "ts_us": "bigint",
        "event_type": "string",
        "value": "double",
    }
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["events"], STREAM_DEDUP_WATERMARK_ORACLE)
    # the dedup actually fired: unique event_ids, half the feed volume
    assert len({r[0] for r in srows}) == len(srows)
    # re-invocation (fresh checkpoint per run) reproduces the set
    again = sorted(tuple(r) for r in q_stream_dedup_watermark(spark, sf_dir).collect())
    assert again == srows


def test_lsh_recall_report_normalizes_pair_orientation(spark):
    """A found frame carrying (id_a > id_b) rows must score as FOUND —
    the raw-identity join silently counted every reversed pair as
    missed, understating recall with no error."""
    from chess_lakehouse_spark.operators.dedup import lsh_recall_report

    exact = spark.createDataFrame(
        [(1, 2, 950_000), (3, 4, 910_000)],
        "id_a long, id_b long, jaccard_ppm long",
    )
    found_reversed = spark.createDataFrame(
        [(2, 1), (4, 3)], "id_a long, id_b long"
    )
    got = lsh_recall_report(exact, found_reversed).collect()
    assert len(got) == 1
    assert (got[0]["n_exact"], got[0]["n_found"], got[0]["recall_ppm"]) == (
        2,
        2,
        1_000_000,
    )
    # and a reversed EXACT side buckets identically too
    exact_rev = exact.select(
        exact.id_b.alias("id_a"), exact.id_a.alias("id_b"), "jaccard_ppm"
    )
    got2 = lsh_recall_report(exact_rev, found_reversed).collect()
    assert sorted(tuple(r) for r in got2) == sorted(tuple(r) for r in got)


def test_scratch_roots_honor_spark_graft_tmpdir(tmp_path, monkeypatch):
    """Every on-disk staging root (lake, stream feeds, MG state) must
    land under SPARK_GRAFT_TMPDIR when set — on a shared-cluster driver
    the system temp dir is a collision/cleanup hazard (r12 advice)."""
    import chess_lakehouse_spark.suite.llm as llm

    base = str(tmp_path / "scratch")
    monkeypatch.setenv("SPARK_GRAFT_TMPDIR", base)
    monkeypatch.setattr(llm, "_SCRATCH_ROOTS", {})
    for fn in (llm._sklake_dir, llm._ssjoin_dir, llm._ssess_dir):
        d = fn("/root/testdata/sf0.001")
        assert d.startswith(base + "/"), (fn.__name__, d)
    # unset -> system default; fresh registry so the env is re-read
    monkeypatch.delenv("SPARK_GRAFT_TMPDIR")
    monkeypatch.setattr(llm, "_SCRATCH_ROOTS", {})
    d = llm._ssjoin_dir("/root/testdata/sf0.001")
    assert not d.startswith(base)


def test_exact_jaccard_pair_budget_guard(spark):
    """max_pairs refuses an over-budget expansion LOUDLY before any pair
    materializes, names the measured size, and suggests a fitting
    sample rate; a budget at/above the measured size passes; the
    sample_rate path keeps the sampled stratum's ground truth exact."""
    import pytest

    from chess_lakehouse_spark.operators.dedup import exact_jaccard_pairs_ppm
    from chess_lakehouse_spark.operators.sampling import hash_sample

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox jumps over a sleepy dog"),
        (4, "entirely different words compose this sample text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = exact_jaccard_pairs_ppm(df, "doc_id", "text", threshold_ppm=1)
    n_full = full.count()
    assert n_full >= 3  # docs 1/2/3 all share shingles

    with pytest.raises(ValueError, match="over the max_pairs budget"):
        exact_jaccard_pairs_ppm(df, "doc_id", "text", threshold_ppm=1, max_pairs=1)
    # a generous budget passes through to the identical result
    ok = exact_jaccard_pairs_ppm(
        df, "doc_id", "text", threshold_ppm=1, max_pairs=10_000
    )
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, full.collect()))

    # sampled audit == unsampled audit restricted to surviving docs
    sampled = exact_jaccard_pairs_ppm(
        df, "doc_id", "text", threshold_ppm=1, sample_rate=0.5, sample_seed=3
    )
    kept = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.5, seed=3).collect()}
    expect = [
        tuple(r)
        for r in full.collect()
        if r["id_a"] in kept and r["id_b"] in kept
    ]
    assert sorted(map(tuple, sampled.collect())) == sorted(expect)
