"""Count-min sketch (operators/sketches.py:cms_* — Cormode &
Muthukrishnan '05): over-count invariant, degenerate-width collapse,
exact merge algebra, lake staging through the incremental rollup, and the
staged q_cms_freq candidate's two-scale oracle parity (the sketch family's
first fully-gateable member — md5 buckets, deterministic cross-engine)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.dedup import tokens
from chess_lakehouse_spark.operators.sketches import (
    CmsSpec,
    cms_build,
    cms_cells,
    cms_estimate,
    cms_merge,
)

SPEC = CmsSpec(depth=3, width=16, seed="t")


def _occ(spark, sf="0.001"):
    docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
    return docs.select(F.explode(tokens(F.col("text"))).alias("term")).where(
        F.col("term") != ""
    )


def test_overcount_invariant_and_wide_sketch_exactness(spark):
    """est >= true for EVERY term; with width far above the vocabulary the
    min over depth rows escapes every collision and est == true."""
    occ = _occ(spark)
    exact = occ.groupBy("term").agg(F.count(F.lit(1)).alias("n_true"))
    est = cms_estimate(cms_build(occ, "term", SPEC), exact, "term", SPEC)
    j = {r.term: (r.n_true, r.est) for r in exact.join(est, "term").collect()}
    assert all(e >= t for t, e in j.values())
    assert any(e > t for t, e in j.values())  # width 16 < vocab: collisions
    wide = CmsSpec(depth=3, width=4096, seed="t")
    est_w = cms_estimate(cms_build(occ, "term", wide), exact, "term", wide)
    jw = {r.term: (r.n_true, r.est) for r in exact.join(est_w, "term").collect()}
    assert all(e == t for t, e in jw.values())


def test_width_one_collapses_to_total_mass(spark):
    """Every counter sees every occurrence: est == N for any probe,
    including a NEVER-SEEN term (the pure-collision estimate)."""
    occ = _occ(spark)
    total = occ.count()
    spec = CmsSpec(depth=2, width=1, seed="z")
    probes = spark.createDataFrame(
        [("value",), ("никогда-not-in-corpus",)], "term string"
    )
    got = {
        r.term: r.est
        for r in cms_estimate(cms_build(occ, "term", spec), probes, "term", spec).collect()
    }
    assert set(got.values()) == {total}


def test_merge_equals_rebuild_exactly(spark):
    """Counters are sums: cms(A) + cms(B) == cms(A ∪ B) cell for cell —
    the per-shard/per-day mergeability contract."""
    occ = _occ(spark)
    a = occ.where(F.crc32("term") % 2 == 0)
    b = occ.where(F.crc32("term") % 2 == 1)
    merged = sorted(
        tuple(r) for r in cms_merge(cms_build(a, "term", SPEC), cms_build(b, "term", SPEC)).collect()
    )
    whole = sorted(tuple(r) for r in cms_build(occ, "term", SPEC).collect())
    assert merged == whole
    with pytest.raises(ValueError, match="at least one"):
        cms_merge()


def test_staged_cms_through_incremental_rollup(spark, tmp_path):
    """The lake form: build_rollup over cms_cells stages the sketch,
    append_rollup folds a delta O(delta), serve_rollup returns counters
    equal to a from-scratch build over the union — and estimates off the
    SERVED sketch match the in-memory path exactly."""
    from chess_lakehouse_spark.operators.rollup import (
        append_rollup,
        build_rollup,
        serve_rollup,
    )

    occ = _occ(spark)
    day1 = occ.where(F.crc32("term") % 3 != 0)
    day2 = occ.where(F.crc32("term") % 3 == 0)
    lake = str(tmp_path / "cms_lake")
    build_rollup(
        cms_cells(day1, "term", SPEC),
        keys=["row_i", "bucket"],
        measures=[("cnt", "count", None)],
        rollup_dir=lake,
        batch_id="day1",
    )
    append_rollup(cms_cells(day2, "term", SPEC), lake, batch_id="day2")
    served = serve_rollup(spark, lake)
    whole = cms_build(occ, "term", SPEC)
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, whole.collect()))
    probes = occ.distinct()
    est_served = cms_estimate(served, probes, "term", SPEC)
    est_mem = cms_estimate(whole, probes, "term", SPEC)
    assert sorted(map(tuple, est_served.collect())) == sorted(
        map(tuple, est_mem.collect())
    )


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_cms_freq_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof: exact values, driver-safe types, both
    local scales; the over-count column is non-trivially split (some terms
    collide in all depth rows, some escape)."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import CMS_FREQ_ORACLE, q_cms_freq

    sdf = q_cms_freq(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == ["string", "bigint", "bigint", "bigint"]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rel = con.sql(CMS_FREQ_ORACLE)
    assert all(
        str(t) in {"VARCHAR", "BIGINT"} for t in rel.types
    ), [str(t) for t in rel.types]
    drows = sorted(tuple(r) for r in con.execute(CMS_FREQ_ORACLE).fetchall())
    con.close()
    assert len(srows) > 0
    assert any(r[3] > 0 for r in srows) and any(r[3] == 0 for r in srows)
    assert all(r[3] >= 0 for r in srows)
    assert srows == drows


def test_stream_cms_equals_batch_sketch(spark, tmp_path):
    """Streaming CMS: because cms_cells is a plain narrow transformation
    and counters are sums, the continuous sketch is just stream_rollup
    over the cell stream — build on a historical slice, fold two document
    drops, and the SERVED sketch equals a from-scratch batch build over
    everything (cell-for-cell, and therefore estimate-for-estimate)."""
    import glob
    import shutil

    from chess_lakehouse_spark.operators.rollup import build_rollup, serve_rollup
    from chess_lakehouse_spark.streaming import stream_rollup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist = docs.where(F.col("doc_id") % 3 == 0)
    d1 = docs.where(F.col("doc_id") % 3 == 1)
    d2 = docs.where(F.col("doc_id") % 3 == 2)

    def occ(df):
        return df.select(F.explode(tokens(F.col("text"))).alias("term")).where(
            F.col("term") != ""
        )

    rdir = str(tmp_path / "cms_rollup")
    build_rollup(
        cms_cells(occ(hist), "term", SPEC),
        keys=["row_i", "bucket"],
        measures=[("cnt", "count", None)],
        rollup_dir=rdir,
    )

    drops = tmp_path / "drops"
    drops.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def land(name, df):
        staging = tmp_path / f"_stage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        shutil.copy(
            glob.glob(f"{staging}/part-*.parquet")[0], drops / f"{name}.parquet"
        )

    def run():
        static = spark.read.parquet(str(drops))
        stream = spark.readStream.schema(static.schema).parquet(str(drops))
        stream_rollup(cms_cells(occ(stream), "term", SPEC), rdir, ckpt)

    land("d1", d1)
    run()
    land("d2", d2)
    run()

    served = serve_rollup(spark, rdir)
    whole = cms_build(occ(docs), "term", SPEC)
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, whole.collect()))
