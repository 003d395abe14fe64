"""Partitioned Parquet publish sink (SURVEY.md §2.1).

Reference semantics: wipe outputs, then
``COPY combined TO dir (FORMAT PARQUET, PARTITION_BY (DataSource, year, month))``
(src/export-to-parquet.ts:51-56,106-110). That run produced 7,584 files for
5.7 GB — a small-files problem that gets fatal at 100 TB (NameNode/S3-listing
pressure, per-file open cost dominating scans). This sink therefore
repartitions BY THE PARTITION COLUMNS before the write so each Hive partition
is produced by a bounded number of tasks, and AQE coalescing keeps tiny
partitions from fanning out into one file per task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    out_dir: str,
    partition_cols: Sequence[str] = ("DataSource", "year", "month"),
    mode: str = "overwrite",
    target_partitions: int | None = None,
) -> None:
    """Hive-partitioned Parquet write with file-count control.

    repartition(partition_cols) hash-clusters rows so every output Hive
    partition is written by as few tasks as actually carry its data; without
    it, every one of N shuffle tasks can open a file in every partition
    (N x |partitions| files — the reference's 7,584-file lake). For very hot
    partition keys, pass target_partitions to cap the shuffle width and let
    AQE split skewed reducers.
    """
    cols = [F.col(c) for c in partition_cols]
    repartitioned = df.repartition(target_partitions, *cols) if target_partitions else df.repartition(*cols)
    (
        repartitioned.write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(out_dir)
    )


def qc_counts(spark: SparkSession, df: DataFrame, error_predicate=None) -> dict[str, int]:
    """The reference's QC probes: total row count + error-row count
    (src/read-pgn.ts:54-56, src/export-to-parquet.ts:102-104). One pass:
    conditional aggregation instead of two jobs."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    if error_predicate is not None:
        aggs.append(F.sum(F.when(error_predicate, 1).otherwise(0)).alias("error_rows"))
    row = df.agg(*aggs).collect()[0]
    return {k: int(v) for k, v in row.asDict().items()}


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table sink: pre-shuffles ONCE at write time
    so that every later equi-join or aggregation on ``bucket_cols`` between
    co-bucketed tables runs with ZERO exchange — the write-amortized answer
    to repeated joins at 100 TB (a fact table is written once, joined
    thousands of times).

    Spark bucketing requires a catalog table (`saveAsTable`); n_buckets
    should be sized so one bucket of the LARGEST co-bucketed table fits an
    executor core's working memory (e.g. 100 TB / 32768 buckets ≈ 3 GB).
    sort_cols additionally sorts within buckets, letting sort-merge joins
    skip their sort phase entirely.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
