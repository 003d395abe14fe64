"""Mergeable distinct-count sketches for corpus accounting.

At 100 TB the questions "how many distinct documents do we have", "how
much do source A and source B overlap", and "how many of today's docs are
genuinely new" cannot be answered with COUNT(DISTINCT) per question —
each is a full shuffle of the corpus. The sketch answer: ONE pass builds
a per-partition-key Apache DataSketches HLL sketch (Spark's native
``hll_sketch_agg`` — map-side combined, kilobytes per key), the sketches
persist to the lake as binary columns, and every later question is
algebra over stored sketches (``hll_union_agg`` + inclusion-exclusion)
touching zero corpus rows. A daily-ingest pipeline keeps one sketch row
per (source, day) and answers month-level dedup-rate questions from
sketch unions alone.

Accuracy class: HLL estimates carry ~1-2% relative error at the default
lgConfigK=12 — the same rows-only verification class as ``approx_stats``
(no cross-engine SQL oracle: DuckDB's approx_count_distinct is a
different HLL implementation with different estimates); accuracy and the
merge algebra are pinned against exact counts in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_sketches(
    df: DataFrame,
    key_cols: list[str],
    text_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """One HLL sketch of distinct content (md5 of ``text_col``) per
    ``key_cols`` group: (key_cols..., sketch binary, est_distinct long,
    n_rows long). One map-side-combined shuffle; each group's state is a
    ~2^lgConfigK-bucket sketch regardless of corpus size. Store the
    sketch column — it is the mergeable artifact every later estimate
    derives from."""
    return (
        df.groupBy(*key_cols)
        .agg(
            F.hll_sketch_agg(F.md5(F.col(text_col)), F.lit(lg_config_k)).alias(
                "sketch"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn(
            "est_distinct", F.hll_sketch_estimate(F.col("sketch")).cast("long")
        )
    )


def union_estimate(sketches: DataFrame, sketch_col: str = "sketch") -> int:
    """Distinct estimate of the UNION of all sketch rows — corpus-wide
    distinct count from stored per-source/per-day sketches, zero corpus
    rows touched. Driver receives one number."""
    row = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias("est")
    ).first()
    return int(row["est"])


def overlap_estimates(
    sketches: DataFrame,
    key_col: str,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Pairwise overlap between sketch rows by inclusion-exclusion:
    ``|A ∩ B| ≈ est(A) + est(B) - est(A ∪ B)`` for every unordered key
    pair — the source-contamination / cross-dump-overlap matrix, computed
    entirely in sketch space. The join is |keys|² over kilobyte rows
    (sketch count, not corpus), and the union runs per pair via
    ``hll_union``. Returns (key_a, key_b, est_a, est_b, est_union,
    est_overlap); estimates are clamped at 0 (inclusion-exclusion on
    independent estimates can go slightly negative on disjoint sets)."""
    a = sketches.select(
        F.col(key_col).alias("key_a"),
        F.col(sketch_col).alias("sk_a"),
    )
    b = sketches.select(
        F.col(key_col).alias("key_b"),
        F.col(sketch_col).alias("sk_b"),
    )
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    est = pairs.select(
        "key_a",
        "key_b",
        F.hll_sketch_estimate("sk_a").cast("long").alias("est_a"),
        F.hll_sketch_estimate("sk_b").cast("long").alias("est_b"),
        F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
        .cast("long")
        .alias("est_union"),
    )
    return est.withColumn(
        "est_overlap",
        F.greatest(
            F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
        ).cast("long"),
    )


def novelty_estimate(
    new_sketch_rows: DataFrame,
    corpus_sketch_rows: DataFrame,
    sketch_col: str = "sketch",
) -> dict[str, int]:
    """Daily-ingest novelty from sketches alone: how many of the new
    batch's distinct contents are NOT already in the corpus —
    ``est(new) - overlap(new, corpus)`` via inclusion-exclusion over the
    stored sketches. Returns {'est_new', 'est_corpus', 'est_union',
    'est_novel'}; cost is O(stored sketch rows), zero corpus rows."""
    new_est = union_estimate(new_sketch_rows, sketch_col)
    corpus_est = union_estimate(corpus_sketch_rows, sketch_col)
    both = new_sketch_rows.select(F.col(sketch_col).alias("s")).unionByName(
        corpus_sketch_rows.select(F.col(sketch_col).alias("s"))
    )
    union_est = union_estimate(both, "s")
    overlap = max(0, new_est + corpus_est - union_est)
    return {
        "est_new": new_est,
        "est_corpus": corpus_est,
        "est_union": union_est,
        "est_novel": max(0, new_est - overlap),
    }


# --------------------------------------------------------------------------
# Count-min sketch: the FREQUENCY complement to the HLL distinct-count
# family above — and, unlike HLL, fully oracle-able: the counters are plain
# sums over md5-derived buckets (the module-wide portability contract), so
# every estimate is a deterministic integer any engine reproduces exactly.
# --------------------------------------------------------------------------

from typing import NamedTuple


class CmsSpec(NamedTuple):
    """Count-min sketch shape: ``depth`` independent hash rows × ``width``
    counters. One spec value must flow through build/merge/estimate — the
    bucket hash is ``md5('<seed>|<row>|<term>') % width``, so two frames
    built under different specs silently disagree; keep the spec next to
    the stored sketch (the rollup spec/ pattern) when staging.

    Error contract (Cormode & Muthukrishnan '05, public): with N total
    occurrences, ``true <= est`` always, and
    ``P[est > true + (e/width)·N] <= e^-depth`` — width buys precision,
    depth buys confidence, state stays depth×width counters at ANY corpus
    size."""

    depth: int = 4
    width: int = 1024
    seed: str = "cms"


def _cms_bucket(term: Column, row_i: Column, spec: CmsSpec) -> Column:
    from chess_lakehouse_spark.operators.dedup import md5_hash64

    return md5_hash64(
        F.concat(F.lit(f"{spec.seed}|"), row_i.cast("string"), F.lit("|"), term)
    ) % spec.width


def cms_cells(df: DataFrame, term_col: str, spec: CmsSpec) -> DataFrame:
    """Pre-aggregation cell stream: one (row_i, bucket) row per term
    OCCURRENCE × depth. This is the form the incremental-rollup machinery
    consumes directly — ``build_rollup(cells, keys=['row_i','bucket'],
    measures=[('cnt','count',None)])`` stages a CMS on the lake whose
    ingest folds are O(delta) and whose serve never touches the corpus
    (counters are sums, so batch-partition folding is exact; pinned in
    tests/test_cms.py). NULL terms are dropped."""
    return (
        df.select(F.col(term_col).alias("term"))
        .where(F.col("term").isNotNull())
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(spec.depth - 1))).alias("row_i"),
            "term",
        )
        .select("row_i", _cms_bucket(F.col("term"), F.col("row_i"), spec).alias("bucket"))
    )


def cms_build(df: DataFrame, term_col: str, spec: CmsSpec) -> DataFrame:
    """Build the sketch in ONE map-combined groupBy over the occurrence
    stream (the explode costs ×depth narrow rows map-side; the shuffle
    carries at most depth×width aggregated cells). Returns the SPARSE form
    (row_i, bucket, cnt) — absent cells are zero."""
    return (
        cms_cells(df, term_col, spec)
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches built under the SAME spec: counters add, so merge is
    union + one map-combined sum — the mergeability that makes per-shard /
    per-day CMS rows foldable exactly like the rollup partials
    (``cms_merge(cms(A), cms(B)) == cms(A ∪ B)`` exactly, pytest-pinned)."""
    if not sketches:
        raise ValueError("cms_merge: need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, term_col: str, spec: CmsSpec
) -> DataFrame:
    """Point-frequency estimates for a probe term set: each probe hashes
    to one cell per row, the estimate is the MIN over rows of the cell
    counters (absent cell = 0; an unseen term can only over-count, never
    under). Cost: |probes|×depth rows against the depth×width sketch — a
    broadcast-sized join at any corpus size; the corpus itself is never
    touched, which is the point of staging the sketch. Returns
    (term, est)."""
    pe = (
        probes.select(F.col(term_col).alias("term"))
        .where(F.col("term").isNotNull())
        .distinct()
        .select(
            "term",
            F.explode(F.sequence(F.lit(0), F.lit(spec.depth - 1))).alias("row_i"),
        )
        .select("term", "row_i", _cms_bucket(F.col("term"), F.col("row_i"), spec).alias("bucket"))
    )
    return (
        pe.join(sketch, ["row_i", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
