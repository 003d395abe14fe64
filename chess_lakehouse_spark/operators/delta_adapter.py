"""Delta Lake variants of the lake-mutation layer — soft-gated adapter.

``operators/publish.py`` answers the reference's in-place ``UPDATE`` /
``DELETE`` (src/find-openings.ts:61,70-80) on PLAIN Parquet: functional
rewrite of affected partitions with dynamic partition overwrite, explicitly
single-writer. When the ``delta-spark`` package (and its JVM jars) are on
the session, the same operations should ride Delta's transaction log
instead — atomic MERGE/DELETE, concurrent-reader safety, time travel —
with the SAME call shape, so a pipeline flips formats without rewriting
call sites.

Gating mirrors ``sources/openings.py``'s ``hf://`` pattern: importable
always, raising a clear, actionable error at call time when the
environment lacks the dependency (this container has no delta-spark; the
adapter's condition builder and gate behavior are pytest-pinned, the
Delta-backed branch is exercised wherever the package exists).

At 100 TB the scale story is Delta's own: MERGE rewrites only files with
matches (data skipping on the join condition), DELETE is a metadata-only
tombstone for whole-file hits, and OPTIMIZE/VACUUM replace
``compact_partitions``/``vacuum_lake``. The plain-Parquet operators stay
the dependency-free default.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    """True when the delta-spark Python package is importable (jars are
    checked lazily by delta itself at session use)."""
    return importlib.util.find_spec("delta") is not None


def _require_delta():
    if not delta_available():
        raise ModuleNotFoundError(
            "delta-spark is not installed; install it (pip install delta-spark) "
            "and build the session with delta.configure_spark_with_delta_pip, "
            "or use the plain-Parquet operators in operators/publish.py "
            "(merge_overwrite / delete_rows)"
        )
    from delta.tables import DeltaTable  # noqa: PLC0415

    return DeltaTable


def merge_condition(key_cols: Sequence[str], left: str = "t", right: str = "u") -> str:
    """The MERGE ON conjunction for ``key_cols`` — split out (and
    pytest-pinned) because it is the part of the adapter that must be
    right even where delta isn't installed. Null-safe equality (``<=>``)
    so a NULL key matches its NULL counterpart instead of silently
    double-inserting."""
    if not key_cols:
        raise ValueError("merge_condition: key_cols must be non-empty")
    return " AND ".join(f"{left}.`{c}` <=> {right}.`{c}`" for c in key_cols)


def merge_overwrite_delta(
    spark: SparkSession,
    lake_dir: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    evolve_schema: bool = False,
) -> None:
    """UPSERT via Delta MERGE — the transactional twin of
    ``publish.merge_overwrite``: matched rows update, unmatched insert;
    ``evolve_schema=True`` maps to Delta's automatic schema evolution
    (additive columns, like the plain-Parquet path's NULL-fill)."""
    DeltaTable = _require_delta()
    if evolve_schema:
        spark.conf.set("spark.databricks.delta.schema.autoMerge.enabled", "true")
    (
        DeltaTable.forPath(spark, lake_dir)
        .alias("t")
        .merge(updates.alias("u"), merge_condition(key_cols))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def delete_rows_delta(
    spark: SparkSession,
    lake_dir: str,
    keys: DataFrame,
    key_cols: Sequence[str],
) -> None:
    """Row-level DELETE via Delta MERGE (whenMatchedDelete) — the
    transactional twin of ``publish.delete_rows``; whole-file hits become
    metadata-only tombstones in the log."""
    DeltaTable = _require_delta()
    (
        DeltaTable.forPath(spark, lake_dir)
        .alias("t")
        .merge(keys.select(*key_cols).distinct().alias("u"), merge_condition(key_cols))
        .whenMatchedDelete()
        .execute()
    )
