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


#: Edge-count ceiling for the driver-side fast path. Near-dup graphs are
#: already LSH-pruned, so edge lists are usually far below this even when
#: the corpus is huge; the distributed loop only pays off beyond it.
DRIVER_UNION_FIND_MAX_EDGES = 1_000_000


def _driver_union_find(pairs: list[tuple]) -> list[tuple]:
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps the canonical representative deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(x, find(x)) for x in parent]


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_max_edges: int = DRIVER_UNION_FIND_MAX_EDGES,
) -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns (id, component) for every node appearing in ``edges``, where
    ``component`` is the smallest node id in the connected component —
    a deterministic canonical representative.

    Hybrid execution, same spirit as a broadcast join: when the (already
    LSH-pruned) edge list is bounded (``<= driver_max_edges``), collect it
    and run union-find on the driver — O(E α(E)), no per-iteration job
    latency. Beyond the bound, fall back to the distributed iterative loop.
    Both paths produce identical output.
    """
    if driver_max_edges:
        # one job answers both "is it bounded?" and "give me the edges"
        head = edges.select(id_a, id_b).take(driver_max_edges + 1)
        if len(head) <= driver_max_edges:
            spark = edges.sparkSession
            if not head:
                return spark.createDataFrame([], schema="id long, component long")
            pairs = [(r[0], r[1]) for r in head]
            return spark.createDataFrame(
                sorted(_driver_union_find(pairs)), schema="id long, component long"
            )

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


def priority_canonical(
    components: DataFrame,
    attrs: DataFrame,
    id_col: str,
    priority_col: str,
) -> DataFrame:
    """Source-priority canonical selection over duplicate clusters: for each
    component, keep the member with the LOWEST priority rank (curated
    sources beat crawls), id ascending as the tie-break — the 'which copy
    do we train on' step after near-dup clustering.

    One equi-join (component ids × member attributes) + one map-combined
    groupBy; the selection aggregate is MIN over a (priority, id) struct —
    lexicographic struct ordering makes the canonical pick deterministic
    under any partitioning. Returns (component, canonical_id, n_members).
    """
    from pyspark.sql import functions as F

    joined = components.join(
        attrs.select(F.col(id_col).alias("id"), F.col(priority_col).alias("prio")), "id"
    )
    return (
        joined.groupBy("component")
        .agg(
            F.min(F.struct(F.col("prio"), F.col("id"))).alias("best"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "component",
            F.col("best.id").alias("canonical_id"),
            "n_members",
        )
    )
