"""Additive schema evolution across lake shards — the Spark mapping of the
reference's idempotent `ALTER TABLE games ADD COLUMN IF NOT EXISTS`
(reference: src/find-openings.ts:60; SURVEY §1.2): old shards lack the new
column, readers see it null-backfilled, and union alignment handles
frames from before/after the evolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.relational import align_and_union


def test_merge_schema_backfills_old_shards(spark, tmp_path):
    lake = str(tmp_path / "lake")
    v1 = spark.createDataFrame([(1, "a")], ["id", "payload"])
    v1.write.parquet(f"{lake}/shard=1")
    v2 = spark.createDataFrame([(2, "b", "enriched")], ["id", "payload", "eco"])
    v2.write.parquet(f"{lake}/shard=2")

    read = spark.read.option("mergeSchema", "true").parquet(lake)
    assert set(read.columns) == {"id", "payload", "eco", "shard"}
    rows = {r.id: r.eco for r in read.collect()}
    assert rows == {1: None, 2: "enriched"}  # old shard null-backfilled


def test_align_and_union_across_evolution(spark):
    v1 = spark.createDataFrame([(1, "a")], ["id", "payload"])
    v2 = spark.createDataFrame([(2, "b", "X")], ["id", "payload", "eco"])
    out = align_and_union([v1, v2])
    rows = {r.id: r.eco for r in out.collect()}
    assert rows == {1: None, 2: "X"}
