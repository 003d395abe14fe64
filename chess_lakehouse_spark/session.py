"""SparkSession factory with scale-appropriate defaults.

The reference delegates execution to a DuckDB subprocess per stage
(reference: src/read-pgn.ts:52, src/export-to-parquet.ts:98); here the
equivalent "engine config" is the SparkSession. Defaults are chosen for
correctness-parity with the DuckDB oracle (UTC session timezone) and for
scale (AQE on, skew-join handling, partial-aggregation pushdown left to
Catalyst, Arrow for any Pandas-UDF stage).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied to every session we build, and re-applied (runtime-settable
#: subset) to sessions handed to us by the test/verify driver.
RUNTIME_CONF: dict[str, str] = {
    # DuckDB timestamps are UTC-naive; pin Spark to UTC so values compare equal.
    "spark.sql.session.timeZone": "UTC",
    # Adaptive execution: runtime partition coalescing + skew-join splitting.
    # At 100 TB these are not optional — AQE re-plans around stats we can't
    # know statically (per-key skew in the contains-join, post-filter sizes).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for the (few) Pandas-UDF stages.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The reference wipes-and-rewrites its export dir for determinism
    # (src/export-to-parquet.ts:51-56); static overwrite matches that.
    "spark.sql.sources.partitionOverwriteMode": "static",
    # The events fixture stores TIMESTAMP(NANOS) which the Parquet reader
    # rejects; read as long and convert to micros in the catalog (DuckDB
    # likewise truncates nanos to its micro-precision TIMESTAMP).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


#: Sessions (by applicationId) that already received RUNTIME_CONF — makes
#: apply_runtime_conf a one-py4j-call no-op after the first query (r16,
#: guide §5 driver constants: every query called it defensively, paying
#: len(RUNTIME_CONF) conf round-trips per invocation; the conf is ours and
#: static per session, so once is enough).
_CONF_APPLIED: set[str] = set()


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an externally-built session.

    The correctness driver builds its own SparkSession; session timezone and
    AQE flags are runtime-settable, so queries() entries call this
    defensively. Applied once per applicationId: anything that re-creates
    the session gets a fresh id and is re-pinned; a caller that mutates
    these specific keys mid-session after the first query is outside the
    engine's contract (the keys are correctness-bearing, e.g. UTC session
    timezone, and nothing here ever changes them back).
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _CONF_APPLIED:
        return spark
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static conf on a running session — keep whatever the driver chose.
            pass
    _CONF_APPLIED.add(app_id)
    return spark


def spread(df, *keys: str):
    """Scale-adaptive parallelism guard for compute-heavy map stages
    (guide §2.5 "input skew: … otherwise repartition immediately after the
    read"): hash-repartition ``df`` to the session's default parallelism
    when — and ONLY when — it currently has fewer partitions.

    Why: the fixture lake stores each table as ONE small parquet file with
    a single row group, so every scan yields ONE partition and everything
    map-side downstream (vector folds, gram hashing, winnowing, per-pair
    cosines under a broadcast join) runs on ONE core regardless of
    ``local[N]`` — measured r16: winnow_fingerprints 2.0 s → 0.4 s,
    semantic_dedup 3.4 s → 2.4 s at sf0.1/local[32] once spread. At
    production scale scans carry hundreds of partitions, the guard
    no-ops, and no extra exchange is ever inserted — this is partitioning
    derived from input vs cores, not a constant tuned to either.

    ``keys`` picks hash partitioning (deterministic under task retry —
    guide §2.5 discourages keyless round-robin, which also pays a local
    sort); callers pass the operator's natural id column. Results are
    row-set-identical: every consumer below is a join/aggregate/window
    keyed on columns, never on physical row order."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)


def local_df(spark: SparkSession, rows, schema, n_slices: int = 1):
    """Driver-local bounded rows → DataFrame in ``n_slices`` partitions
    (default ONE).

    ``spark.createDataFrame(list, schema)`` parallelizes the pickled rows
    into ``defaultParallelism`` slices; every slice deserialized by a task
    costs one Python-worker round trip, so a downstream single-task
    consumer (``coalesce(1)`` sidecar writes, tiny spec tables) pays them
    SEQUENTIALLY — measured r15: a 7-row rollup spec write cost ~5 s at
    local[32] (32 handshakes) vs ~0.3 s at one slice. Every caller here
    holds a list bounded by construction (spec rows, centroid literals,
    merge lists, probe sets), so one partition is the right layout at any
    corpus scale — these frames never carry data-proportional rows."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, max(1, int(n_slices))), schema
    )


def get_spark(
    app_name: str = "chess_lakehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    shuffle_partitions defaults to the local core count: the 200-partition
    Spark default over-parallelizes local tests and under-parallelizes a real
    cluster; deployments should size it to ~2-3x total executor cores.
    """
    par = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{par}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or par))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_conf(spark)
