"""Incremental materialized rollup (operators/rollup.py): exact
equivalence with direct aggregation, append==rebuild, retry idempotency,
coarser-grain serving, crash-safe compaction, and the staged-serve plan
pin (serve never touches the raw corpus)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.rollup import (
    append_rollup,
    build_rollup,
    compact_rollup,
    read_spec,
    serve_rollup,
    time_bucket,
)

MEASURES = [
    ("n", "count", None),
    ("n_chars_nn", "countnn", "n_chars"),
    ("sum_chars", "sum", "n_chars"),
    ("sum_chars6", "sum6", "n_chars"),
    ("min_chars", "min", "n_chars"),
    ("max_chars", "max", "n_chars"),
]


def _direct(df, keys):
    """The served values computed straight from the raw frame."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("n_chars").alias("n_chars_nn"),
        F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        F.expr(
            "CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE)"
        ).alias("sum_chars6"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").persist()


def test_build_serve_equals_direct_and_plan_reads_only_lake(
    spark, docs, tmp_path
):
    d = str(tmp_path / "r")
    build_rollup(docs, ["source", "lang"], MEASURES, d)
    served = serve_rollup(spark, d)
    assert _rows(served) == _rows(_direct(docs, ["source", "lang"]))
    # the serve plan must read ONLY the staged lake, never the corpus
    assert served.inputFiles() and all(
        f"{tmp_path}/r/agg" in f for f in served.inputFiles()
    )
    # spec round-trip
    keys, measures = read_spec(spark, d)
    assert keys == ["source", "lang"]
    assert measures == [tuple(m) for m in MEASURES]


def test_append_equals_rebuild_and_direct(spark, docs, tmp_path):
    base = docs.where(F.col("doc_id") % 3 != 0)
    delta = docs.where(F.col("doc_id") % 3 == 0)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_rollup(base, ["source"], MEASURES, inc)
    append_rollup(delta, inc, "d1")
    build_rollup(docs, ["source"], MEASURES, full)
    want = _rows(_direct(docs, ["source"]))
    assert _rows(serve_rollup(spark, inc)) == want
    assert _rows(serve_rollup(spark, full)) == want


def test_append_retry_is_idempotent(spark, docs, tmp_path):
    """A crash-replay of the same batch_id rewrites its own partition —
    state and served values are identical after a double fold."""
    d = str(tmp_path / "r")
    base = docs.where(F.col("doc_id") % 3 != 0)
    delta = docs.where(F.col("doc_id") % 3 == 0)
    build_rollup(base, ["source"], MEASURES, d)
    append_rollup(delta, d, "d1")
    s1 = _rows(serve_rollup(spark, d))
    agg1 = _rows(spark.read.parquet(f"{d}/agg"))
    append_rollup(delta, d, "d1")
    assert _rows(serve_rollup(spark, d)) == s1
    assert _rows(spark.read.parquet(f"{d}/agg")) == agg1


def test_serve_coarser_grain(spark, docs, tmp_path):
    d = str(tmp_path / "r")
    build_rollup(docs, ["source", "lang"], MEASURES, d)
    assert _rows(serve_rollup(spark, d, keys=["source"])) == _rows(
        _direct(docs, ["source"])
    )
    with pytest.raises(ValueError, match="not in staged keys"):
        serve_rollup(spark, d, keys=["doc_id"])


def test_compact_preserves_values(spark, docs, tmp_path):
    d = str(tmp_path / "r")
    build_rollup(docs.where(F.col("doc_id") % 3 == 0), ["source"], MEASURES, d)
    append_rollup(docs.where(F.col("doc_id") % 3 == 1), d, "d1")
    append_rollup(docs.where(F.col("doc_id") % 3 == 2), d, "d2")
    before = _rows(serve_rollup(spark, d))
    compact_rollup(spark, d)
    assert _rows(serve_rollup(spark, d)) == before
    parts = {
        r.batch_id
        for r in spark.read.parquet(f"{d}/agg").select("batch_id").distinct().collect()
    }
    assert parts == {"base"}


def test_avg6_derivation_and_null_group(spark, tmp_path):
    rows = [(1, "a", 10.0), (2, "a", 0.5), (3, "b", None), (4, "b", None)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    d = str(tmp_path / "r")
    build_rollup(
        df, ["g"], [("nn", "countnn", "v"), ("s6", "sum6", "v")], d
    )
    got = {
        r.g: r.avg_v
        for r in serve_rollup(
            spark, d, avg6=[("avg_v", "s6", "nn")]
        ).collect()
    }
    assert got["a"] == 5.25
    assert got["b"] is None  # all-NULL group: AVG is NULL, not an ANSI error


def test_rebuild_clears_stale_batches(spark, docs, tmp_path):
    d = str(tmp_path / "r")
    build_rollup(docs, ["source"], MEASURES, d)
    append_rollup(docs.limit(50), d, "d1")
    build_rollup(docs, ["source"], MEASURES, d)  # fresh lifecycle
    assert _rows(serve_rollup(spark, d)) == _rows(_direct(docs, ["source"]))


def test_validation_errors(spark, docs, tmp_path):
    d = str(tmp_path / "r")
    with pytest.raises(ValueError, match="at least one group key"):
        build_rollup(docs, [], MEASURES, d)
    with pytest.raises(ValueError, match="unknown agg"):
        build_rollup(docs, ["source"], [("x", "median", "n_chars")], d)
    with pytest.raises(ValueError, match="needs a column"):
        build_rollup(docs, ["source"], [("x", "sum", None)], d)
    with pytest.raises(ValueError, match="duplicate output column"):
        build_rollup(docs, ["source"], [("source", "count", None)], d)
    with pytest.raises(ValueError, match="batch_id"):
        build_rollup(docs, ["source"], MEASURES, d, batch_id="a/b")
    build_rollup(
        docs, ["source"], [("s6", "sum6", "n_chars"), ("n", "count", None)], d
    )
    with pytest.raises(ValueError, match="avg6"):
        serve_rollup(spark, d, avg6=[("a", "n", "s6")]).collect()


def test_time_bucket_matches_date_trunc_hour(spark):
    from chess_lakehouse_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select("ts")
    got = ev.select(
        time_bucket(F.col("ts"), 3600).alias("b"),
        (F.unix_micros(F.date_trunc("hour", "ts")) / F.lit(1_000_000))
        .cast("long")
        .alias("want"),
    )
    assert got.where(F.col("b") != F.col("want")).count() == 0
    assert dict(got.dtypes)["b"] == "bigint"
    with pytest.raises(ValueError, match="positive"):
        time_bucket(F.col("ts"), 0)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_rollup_staged_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof for the staged rollup: exact values,
    driver-safe types, both local scales; the delta split is non-empty on
    both sides so build AND append contribute to every served group."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import (
        ROLLUP_STAGED_ORACLE,
        q_rollup_staged,
    )

    sdf = q_rollup_staged(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == [
        "bigint", "string", "bigint", "bigint",
        "double", "double", "double", "double",
    ]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    rel = con.sql(ROLLUP_STAGED_ORACLE)
    assert all(
        str(t) in {"BIGINT", "VARCHAR", "DOUBLE"} for t in rel.types
    ), [str(t) for t in rel.types]
    drows = sorted(tuple(r) for r in con.execute(ROLLUP_STAGED_ORACLE).fetchall())
    con.close()
    assert len(srows) > 1
    assert srows == drows


def test_pipeline_cli_rollup_stages(spark, tmp_path):
    """Host-orchestrated lifecycle: build → append → serve (with compact,
    coarser keys, derived mean) through the CLI flags."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base_p, delta_p = str(tmp_path / "base"), str(tmp_path / "delta")
    docs.where(F.col("doc_id") % 3 != 0).write.parquet(base_p)
    docs.where(F.col("doc_id") % 3 == 0).write.parquet(delta_p)
    rdir, out = str(tmp_path / "rollup"), str(tmp_path / "served")

    pipeline_cli.main([
        "rollup-build", "--inParquet", base_p, "--rollupDir", rdir,
        "--keys", "source,lang",
        "--measures", "n:count,nn:countnn:n_chars,s6:sum6:n_chars,mx:max:n_chars",
    ])
    pipeline_cli.main([
        "rollup-append", "--inParquet", delta_p, "--rollupDir", rdir,
        "--batchId", "2026-08-14",
    ])
    pipeline_cli.main([
        "rollup-serve", "--rollupDir", rdir, "--outDir", out,
        "--keys", "source", "--avg6", "avg:s6:nn", "--compact",
    ])
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(
        tuple(r)
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("n_chars").alias("nn"),
            F.expr("CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE)").alias("s6"),
            F.max("n_chars").alias("mx"),
            F.avg(F.col("n_chars").cast("double")).alias("avg"),
        )
        .collect()
    )
    # the exact-6-decimal mean vs float AVG: compare with rounding
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:5] == w[:5]
        assert abs(g[5] - w[5]) < 1e-6


def test_percentiles_from_bucketed_rollup(spark, docs, tmp_path):
    """Rollup keyed on a bucket column serves per-group percentile buckets
    that exactly contain the rank-ceil(p*n) element — verified against a
    Python rank computation on the raw data."""
    import math

    from chess_lakehouse_spark.operators.rollup import (
        bucket_key,
        percentile_from_counts,
    )

    LO, W, NB = 0, 50, 200
    keyed = docs.withColumn("b", bucket_key(F.col("n_chars"), LO, W, NB))
    d = str(tmp_path / "r")
    build_rollup(keyed, ["source", "b"], [("cnt", "count", None)], d)
    served = serve_rollup(spark, d)
    got = {
        r.source: (r.p50, r.p90)
        for r in percentile_from_counts(
            served, ["source"], "b", "cnt", [0.5, 0.9]
        ).collect()
    }

    raw = {}
    for r in docs.select("source", "n_chars").collect():
        raw.setdefault(r.source, []).append(r.n_chars)
    for src, vals in raw.items():
        vals.sort()
        for p, slot in ((0.5, 0), (0.9, 1)):
            elem = vals[math.ceil(p * len(vals)) - 1]
            want_bucket = min(max((elem - LO) // W, 0), NB - 1)
            assert got[src][slot] == want_bucket, (src, p)

    with pytest.raises(ValueError, match="ps must be"):
        percentile_from_counts(served, ["source"], "b", "cnt", [1.5])
    with pytest.raises(ValueError, match="width"):
        bucket_key(F.col("n_chars"), 0, 0, 10)


def test_hll_measure_unions_across_groups_and_appends(spark, tmp_path):
    """The sketch measure: distinct counts survive coarser re-grouping as
    a UNION (overlapping members count once — where summing per-group
    distincts double-counts), and append == rebuild on the estimate."""
    rows = []
    # group (g, sub): users 0..49 appear in BOTH subs of g='a' — the
    # overlap that breaks additive "distinct" aggregation
    for u in range(50):
        rows.append((u, "a", "x"))
        rows.append((u, "a", "y"))
    for u in range(50, 80):
        rows.append((u, "b", "x"))
    df = spark.createDataFrame(rows, "user long, g string, sub string")
    d = str(tmp_path / "r")
    measures = [("n", "count", None), ("du", "hll", "user")]
    build_rollup(df, ["g", "sub"], measures, d)
    fine = {(r.g, r.sub): r.du for r in serve_rollup(spark, d).collect()}
    assert fine[("a", "x")] == 50 and fine[("a", "y")] == 50
    coarse = {r.g: r.du for r in serve_rollup(spark, d, keys=["g"]).collect()}
    assert coarse["a"] == 50  # union, NOT 100 — the additive trap
    assert coarse["b"] == 30

    # append == rebuild on estimates
    inc = str(tmp_path / "inc")
    build_rollup(df.where(F.col("user") < 40), ["g"], measures, inc)
    append_rollup(df.where(F.col("user") >= 40), inc, "d1")
    got = {r.g: r.du for r in serve_rollup(spark, inc).collect()}
    assert got == {"a": 50, "b": 30}
    assert dict(serve_rollup(spark, inc).dtypes)["du"] == "bigint"


from hypothesis import given, settings
from hypothesis import strategies as st

_ROW = st.tuples(
    st.sampled_from(["a", "b", "c"]),
    st.one_of(st.none(), st.integers(-1000, 1000)),
    st.one_of(
        st.none(),
        st.floats(-100, 100, allow_nan=False, allow_infinity=False),
    ),
)


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(_ROW, min_size=1, max_size=50), n_deltas=st.integers(0, 3))
def test_rollup_fold_property(spark, rows, n_deltas):
    """Property: any round-robin split of the corpus into base + N delta
    folds serves IDENTICAL values to the direct one-shot aggregation —
    over random groups, NULL-bearing ints and doubles, and empty chunks
    (a delta with zero rows must be a no-op)."""
    import tempfile

    df = spark.createDataFrame(rows, "g string, iv long, dv double")
    d = tempfile.mkdtemp(prefix="rollup_prop_") + "/r"
    measures = [
        ("n", "count", None),
        ("nn", "countnn", "dv"),
        ("si", "sum", "iv"),
        ("s6", "sum6", "dv"),
        ("mn", "min", "dv"),
        ("mx", "max", "iv"),
    ]
    chunks = n_deltas + 1
    tagged = df.withColumn(
        "_c", F.monotonically_increasing_id() % chunks
    ).persist()
    build_rollup(tagged.where(F.col("_c") == 0).drop("_c"), ["g"], measures, d)
    for i in range(1, chunks):
        append_rollup(tagged.where(F.col("_c") == i).drop("_c"), d, f"d{i}")
    got = _rows(serve_rollup(spark, d))
    want = _rows(
        df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.count("dv").alias("nn"),
            F.sum(F.col("iv").cast("long")).alias("si"),
            F.expr("CAST(SUM(CAST(dv AS DECIMAL(18,6))) AS DOUBLE)").alias("s6"),
            F.min("dv").alias("mn"),
            F.max("iv").alias("mx"),
        )
    )
    tagged.unpersist()
    assert got == want


def test_percentile_exact_boundary_and_label_collision(spark, tmp_path):
    """p=0.55 over exactly 100 rows: the rank threshold is EXACTLY 55 —
    a float ceil(0.55*100) computes 56 (IEEE 0.55*100 = 55.000...007) and
    reports the wrong bucket when ranks 55/56 straddle a boundary."""
    from chess_lakehouse_spark.operators.rollup import percentile_from_counts

    # buckets 0..99, one row each: rank k lives in bucket k-1
    df = spark.createDataFrame(
        [("g", b, 1) for b in range(100)], "g string, b long, cnt long"
    )
    got = percentile_from_counts(df, ["g"], "b", "cnt", [0.55]).collect()[0]
    assert got["p55"] == 54  # rank 55 -> bucket 54; float ceil would say 55

    with pytest.raises(ValueError, match="collide"):
        percentile_from_counts(df, ["g"], "b", "cnt", [0.12, 0.125])


def test_sum6_partials_are_wide_and_old_long_state_migrates(spark, docs, tmp_path):
    """r12 accumulator widening: sum6 partials are DECIMAL(38,0) (a LONG
    partial aborts under ANSI past ~9.2e12 summed units), and a pre-r12
    state whose partials are LONG is MIGRATED by compact_rollup (the
    merge casts at read), after which appends and serving work
    unchanged."""
    d = str(tmp_path / "r")
    build_rollup(docs.where(F.col("doc_id") % 2 == 0), ["source"], MEASURES, d)
    agg = spark.read.parquet(f"{d}/agg")
    assert dict(agg.dtypes)["sum_chars6"] == "decimal(38,0)"

    # simulate a pre-r12 state: rewrite the partials with LONG sum6
    old = agg.withColumn("sum_chars6", F.col("sum_chars6").cast("long"))
    tmp = str(tmp_path / "old_agg")
    old.write.partitionBy("batch_id").parquet(tmp)
    import shutil

    shutil.rmtree(f"{d}/agg")
    shutil.move(tmp, f"{d}/agg")
    assert dict(spark.read.parquet(f"{d}/agg").dtypes)["sum_chars6"] == "bigint"

    # serving an all-LONG state still works (cast-at-merge)...
    before = _rows(serve_rollup(spark, d))
    # ...and compaction migrates it to the wide layout
    compact_rollup(spark, d)
    assert dict(spark.read.parquet(f"{d}/agg").dtypes)["sum_chars6"] == "decimal(38,0)"
    assert _rows(serve_rollup(spark, d)) == before

    # post-migration appends compose and equal the direct aggregate
    append_rollup(docs.where(F.col("doc_id") % 2 == 1), d, "d1")
    assert _rows(serve_rollup(spark, d)) == _rows(_direct(docs, ["source"]))
