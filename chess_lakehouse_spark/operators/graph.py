"""Iterative graph operators for dedup clustering.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep one
canonical doc per connected component of the similarity graph). This is the
one genuinely iterative algorithm in the engine — a driver loop over
DataFrame jobs, the idiomatic Spark shape for label propagation (GraphX is
RDD-era; DataFrame + AQE is the maintained path).

Scale notes: each iteration is one equi-join + one min-aggregation, both
hash-partitioned on node id; lineage is truncated per iteration with
``localCheckpoint`` (without it the plan doubles every round and the
optimizer chokes long before 100 TB). Convergence is detected with a
single scalar aggregate — labels only ever decrease, so an unchanged
label-sum means a fixed point. Iteration count is bounded by the cluster
diameter, which for near-dup graphs is tiny (dups of a doc are dups of
each other); ``max_iter`` is a safety rail, and hitting it raises rather
than silently returning half-merged clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns (id, component) for every node appearing in ``edges``, where
    ``component`` is the smallest node id in the connected component —
    a deterministic canonical representative.
    """
    sym = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).union(
        edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("lbl", F.col("id"))
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]

    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels.select(F.col("id").alias("src"), F.col("lbl").alias("nlbl")), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("nlbl").alias("minn"))
        )
        labels = (
            labels.join(neigh_min, "id", "left")
            .select("id", F.least("lbl", F.coalesce("minn", F.col("lbl"))).alias("lbl"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select("id", F.col("lbl").alias("component"))
        prev_sum = cur_sum

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations — "
        "component diameter exceeds the safety rail; raise max_iter"
    )
