"""Top-1 (argmax) enrichment against a bounded dimension.

This is the Spark-first re-expression of the reference's centerpiece — the
correlated LATERAL top-1 join that tags each game with the longest matching
ECO opening (reference: src/find-openings.ts:73-79):

    JOIN LATERAL (SELECT o.eco, o.name FROM openings_with_ply o
                  WHERE CONTAINS(t.clean_movetext, o.pgn)
                  ORDER BY o.opening_ply DESC LIMIT 1) o ON TRUE

A literal translation (cross join + per-key window) shuffles the ENTIRE fact
table by key just to rank a handful of matches — at 100 TB that shuffle is
the whole job. Two implementations are provided; both add the deterministic
tie-break the reference lacks (SURVEY.md §2.3 ⚠).

1. ``enrich_top1_mapside`` (preferred, used by the chess pipeline): the
   dimension is collapsed to ONE array<struct> row, broadcast-cross-joined
   onto the fact table, and the argmax is computed per fact row with
   higher-order functions (FILTER + REDUCE over the array). Zero shuffle,
   zero window, stays inside whole-stage codegen; scales as
   O(|fact| * |dim|) comparisons map-side, which is exactly what the
   reference's nested-loop lateral does — minus its single-process limit.
   Requires the dimension to fit in a broadcast (~3.5k openings: trivially).

2. ``enrich_top1_join`` (generic): broadcast theta-join + max_by aggregation
   for dimensions too large to collapse, or when the predicate needs the
   planner (e.g. an equi-prejoin component). Shuffles only
   (key, best-payload) pairs thanks to partial aggregation — not full rows.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _better(a: Column, b: Column, rank_field: str, tiebreak_fields: Sequence[str]) -> Column:
    """True iff candidate ``b`` beats incumbent ``a``: higher rank wins, then
    ascending lexicographic tie-break (deterministic where the reference's
    bare ``ORDER BY ply DESC LIMIT 1`` is engine-arbitrary)."""
    cond = a.isNull() | (b[rank_field] > a[rank_field])
    eq = b[rank_field] == a[rank_field]
    for f in tiebreak_fields:
        cond = cond | (eq & (b[f] < a[f]))
        eq = eq & (b[f] == a[f])
    return cond


def enrich_top1_mapside(
    fact: DataFrame,
    dim: DataFrame,
    predicate: Callable[[Column, Column], Column],
    fact_probe_col: str,
    rank_col: str,
    payload_cols: Sequence[str],
    tiebreak_cols: Sequence[str] | None = None,
    out_prefix: str = "",
    only_if_null: str | None = None,
    max_dim_rows: int = 10_000,
) -> DataFrame:
    """Map-side argmax enrichment: no shuffle of the fact table at all.

    For each fact row, scans the (broadcast) dimension array, keeps candidates
    where ``predicate(fact[fact_probe_col], candidate)`` holds, and reduces to
    the single best by (rank_col DESC, *tiebreak_cols ASC). Payload columns are
    appended as ``{out_prefix}{col}`` (NULL when nothing matches — the
    reference's inner-lateral leaves unmatched rows untouched,
    src/find-openings.ts:79).

    only_if_null: name of an existing fact column; rows where it is already
    non-NULL are not enriched (reference enriches only ``Opening IS NULL``
    rows, src/find-openings.ts:68): each output column keeps its existing
    fact value on those rows (NULL if the output column is new).

    max_dim_rows guards the plan: the dim is embedded as a literal
    array<struct> whose size is linear in the dim (serialized into every
    task binary, compiled into the plan). Beyond the cap this raises —
    use ``enrich_top1_join``, which broadcasts through the exchange
    machinery instead of the plan, for larger dimensions.
    """
    tiebreak_cols = list(tiebreak_cols or [])
    if only_if_null is not None and only_if_null not in fact.columns:
        raise ValueError(
            f"enrich_top1_mapside: only_if_null column {only_if_null!r} "
            f"not found on the fact side (columns: {fact.columns})"
        )
    # All dim columns ride along in the struct — the predicate may probe any
    # of them (e.g. the `pgn` prefix string), not just rank/payload.
    struct_cols = [rank_col, *[c for c in dim.columns if c != rank_col]]

    # Materialize the bounded dim on the driver and embed it as a typed
    # literal array — semantically a broadcast variable, but expressed as a
    # constant in the plan so the enrichment is a pure map-side projection.
    # (A crossJoin against a collect_list-aggregated 1-row frame plans the
    # same thing, but Spark 4.1 miscompiles outer column references inside
    # HOF lambdas over that shape on a cold JVM — ATTRIBUTE_NOT_FOUND.)
    elem_type = dim.select(F.struct(*[F.col(c) for c in struct_cols]).alias("s")).schema[
        "s"
    ].dataType
    # One job both guards and collects: fetch max_dim_rows+1 rows — if the
    # limit row materializes, the dim is too big (and we never executed the
    # dim subtree twice).
    fetched = dim.select(*struct_cols).distinct().limit(max_dim_rows + 1).collect()
    if len(fetched) > max_dim_rows:
        raise ValueError(
            f"enrich_top1_mapside: dimension exceeds max_dim_rows={max_dim_rows}; "
            "the literal-array plan would bloat linearly with the dim — "
            "use enrich_top1_join for large dimensions"
        )
    dim_rows = sorted(fetched, key=lambda r: tuple((v is None, v) for v in r))
    arr = F.array(
        *[
            F.struct(
                *[F.lit(r[c]).cast(f.dataType).alias(c) for c, f in zip(struct_cols, elem_type.fields)]
            )
            for r in dim_rows
        ]
    )
    joined = fact.withColumn("__dim_arr", arr)

    probe = F.col(fact_probe_col)
    matches = F.filter(F.col("__dim_arr"), lambda c: predicate(probe, c))
    best = F.aggregate(
        matches,
        F.lit(None).cast(elem_type),
        lambda acc, c: F.when(_better(acc, c, rank_col, tiebreak_cols), c).otherwise(acc),
    )
    out = joined.withColumn("__best", best).drop("__dim_arr")
    for c in payload_cols:
        new = f"{out_prefix}{c}"
        val = F.col("__best")[c]
        if only_if_null is not None:
            keep = F.col(new) if new in fact.columns else F.lit(None)
            val = F.when(F.col(only_if_null).isNull(), val).otherwise(keep)
        out = out.withColumn(new, val)
    return out.drop("__best")


def enrich_top1_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    key_cols: Sequence[str],
    rank_col: str,
    payload_cols: Sequence[str],
    tiebreak_cols: Sequence[str] | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Generic argmax enrichment: broadcast theta-join then per-key top-1.

    Returns one row per matched key: (key_cols..., rank_col, payload_cols...).
    Callers left-join this back onto the fact table (unmatched keys keep their
    existing values — the reference's inner-lateral update semantics,
    src/find-openings.ts:79).

    Scale notes: the fact side is projected to (keys, probe) BEFORE the join,
    so the only thing shuffled by the top-1 window is the narrow match set —
    never full fact rows. The dim side is broadcast (no shuffle for the join
    itself); Catalyst would otherwise plan a cartesian for a theta predicate.
    The window orders by (rank DESC, tiebreaks ASC) — deterministic where the
    reference's bare ``ORDER BY ply DESC LIMIT 1`` is engine-arbitrary.
    """
    from pyspark.sql.window import Window

    tiebreak_cols = list(tiebreak_cols or [])
    d = F.broadcast(dim) if broadcast_dim else dim
    matches = fact.join(d, on, "inner").select(
        *key_cols, rank_col, *[c for c in payload_cols if c not in (rank_col, *key_cols)]
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(rank_col).desc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    return (
        matches.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
