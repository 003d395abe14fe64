"""Projection / filter / union / sort-limit building blocks (SURVEY.md §2.2, §2.7, §2.8).

The reference's versions of these are SQL fragments assembled in TypeScript
(fixed 20-column export projection at src/export-to-parquet.ts:70-93; UNION ALL
via repeated INSERT at src/export-to-parquet.ts:58-100; no generic sort/limit).
Here they are thin, Catalyst-visible DataFrame compositions — the value added
is schema alignment and determinism, not execution logic.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def align_and_union(dfs: Sequence[DataFrame]) -> DataFrame:
    """UNION ALL over per-source frames with schema alignment.

    Replicates the reference's CTAS-then-INSERT loop
    (src/export-to-parquet.ts:58-100) as one ``unionByName`` chain; columns
    missing from a source are NULL-filled (allowMissingColumns), mirroring the
    additive `ALTER TABLE ... ADD COLUMN IF NOT EXISTS` schema evolution at
    src/find-openings.ts:60. A union is a zero-shuffle operator in Spark —
    partitions of the inputs are simply concatenated.
    """
    if not dfs:
        raise ValueError("align_and_union: need at least one DataFrame")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. `orderBy().limit()` lets Spark plan a TakeOrderedAndProject:
    each partition keeps only its local top-k, the driver merges k*partitions
    rows — no global sort shuffle. Callers must pass a total order (include a
    unique key) for deterministic results."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Per-group top-k via row_number window (SURVEY.md §2.6/§2.7).

    One hash shuffle on the group keys; with AQE skew handling on, a hot group
    is split at runtime. Pass a total order for determinism.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn(rank_name, F.row_number().over(w)).where(F.col(rank_name) <= k)
