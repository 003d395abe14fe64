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
    compression: str = "zstd",
) -> None:
    """Hive-partitioned Parquet write with file-count control.

    repartition(partition_cols) hash-clusters rows so every output Hive
    partition is written by as few tasks as actually carry its data; without
    it, every one of N shuffle tasks can open a file in every partition
    (N x |partitions| files — the reference's 7,584-file lake). For very hot
    partition keys, pass target_partitions to cap the shuffle width and let
    AQE split skewed reducers.

    ``compression`` defaults to zstd: at 100 TB the lake's at-rest size and
    scan throughput both beat snappy (~30% smaller at comparable decode
    cost on modern CPUs); pass "snappy" to match older readers.
    """
    cols = [F.col(c) for c in partition_cols]
    repartitioned = df.repartition(target_partitions, *cols) if target_partitions else df.repartition(*cols)
    (
        repartitioned.write.mode(mode)
        .option("compression", compression)
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


def merge_overwrite(
    spark: SparkSession,
    lake_dir: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] = ("DataSource", "year", "month"),
) -> None:
    """UPSERT into the partitioned lake without a table format: the
    functional answer to the reference's in-place ``UPDATE games SET ...``
    (src/find-openings.ts:61,70-80) on immutable Parquet (SURVEY.md §2.4).

    Only the partitions present in ``updates`` are touched: existing rows of
    those partitions that do NOT match an update key survive (left-anti),
    update rows replace/append the rest, and the write uses *dynamic*
    partition overwrite so untouched partitions are never rewritten. This is
    the Delta-MERGE shape expressed on plain Parquet — at 100 TB the cost is
    proportional to the partitions being merged, not the lake.

    Keys must be unique within ``updates``. Not concurrent-writer-safe
    (plain Parquet has no transaction log); serialize merges per lake.

    Two subtleties this handles (both produce silent data corruption if
    skipped): partition VALUES must round-trip as the exact directory
    strings — type inference would read ``month=01`` back as int 1 and
    overwrite a *different* directory ``month=1`` — so the existing lake is
    read with inference off and update partition values are cast to string;
    and the merged frame is materialized (localCheckpoint) BEFORE the write,
    because its lineage reads the very files the overwrite replaces.
    """
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev_infer = spark.conf.get(infer_key)
    spark.conf.set(infer_key, "false")
    try:
        existing = spark.read.parquet(lake_dir)
    finally:
        spark.conf.set(infer_key, prev_infer)
    for c in partition_cols:
        updates = updates.withColumn(c, F.col(c).cast("string"))
    affected = updates.select(*partition_cols).distinct()
    # partition-pruned read of only the affected partitions
    target = existing.join(F.broadcast(affected), on=list(partition_cols), how="left_semi")
    keep = target.join(updates.select(*key_cols), on=list(key_cols), how="left_anti")
    merged = keep.unionByName(updates.select(*keep.columns)).localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition(*[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(lake_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partitions(
    spark: SparkSession,
    lake_dir: str,
    partition_cols: Sequence[str] = ("DataSource", "year", "month"),
    target_partitions: int | None = None,
) -> None:
    """Small-files compaction: rewrite the lake so each Hive partition is
    produced by as few tasks as carry its data (the maintenance job that
    undoes streaming-append / per-batch fragmentation — the reference's
    export produced 7,584 files for 5.7 GB, dvc.lock:2022). Content is
    byte-identical; only file layout changes. Run periodically, or per
    partition after heavy append traffic.

    Partition values round-trip exactly: the snapshot is read with
    partition type inference OFF (same hazard as ``merge_overwrite`` —
    inference would read ``month=01`` back as int 1 and rewrite the
    directory as ``month=1``, silently changing values and schema).

    The directory swap goes through the Hadoop FileSystem API, so the
    operator works on any supported scheme (file://, hdfs://, s3a://, ...).
    On HDFS/local-FS the final rename is atomic; on S3-like stores rename
    is copy+delete, leaving a non-atomic window in which readers see a
    partial lake — schedule compaction in a maintenance window there, or
    use a table format with a transaction log for concurrent readers.
    """
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev_infer = spark.conf.get(infer_key)
    spark.conf.set(infer_key, "false")
    try:
        snapshot = spark.read.parquet(lake_dir)
        cols = [F.col(c) for c in partition_cols]
        repartitioned = (
            snapshot.repartition(target_partitions, *cols)
            if target_partitions
            else snapshot.repartition(*cols)
        )
        # rewrite via a temp location: Spark cannot overwrite a path it is
        # concurrently reading from
        tmp = lake_dir.rstrip("/") + ".compacting"
        repartitioned.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
    finally:
        spark.conf.set(infer_key, prev_infer)

    # Swap by renaming the live directory ASIDE first (dst -> dst.old),
    # then src -> dst, then deleting dst.old. A crash between the two
    # renames leaves a one-rename no-data window plus a rollback copy in
    # .old — unlike delete-then-rename, the lake is never the ONLY copy
    # destroyed (each single rename/delete is atomic on HDFS/local FS).
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    dst = jvm.org.apache.hadoop.fs.Path(lake_dir)
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    old = jvm.org.apache.hadoop.fs.Path(lake_dir.rstrip("/") + ".old")
    fs = dst.getFileSystem(hconf)
    if fs.exists(old) and not fs.delete(old, True):
        raise IOError(f"compact_partitions: failed to clear stale {old}")
    if not fs.rename(dst, old):
        raise IOError(f"compact_partitions: failed to move {lake_dir} aside")
    if not fs.rename(src, dst):
        fs.rename(old, dst)  # roll back: restore the original lake
        raise IOError(
            f"compact_partitions: rename {tmp} -> {lake_dir} failed; "
            "original lake restored, compacted data intact in .compacting"
        )
    if not fs.delete(old, True):
        raise IOError(
            f"compact_partitions: swap succeeded but could not remove {old}; "
            "delete it manually"
        )
