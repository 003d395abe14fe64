"""Record-linkage / entity-resolution primitives: multi-key blocking +
exact per-field pair similarities.

The classic Fellegi-Sunter pipeline (blocking → per-field comparison →
match decision; Fellegi & Sunter JASA 1969, public) re-expressed in the
repo's never-all-pairs discipline: candidate pairs come ONLY from
blocking-key collisions (the same ``cooccur_pairs`` array-domain
expansion the LSH family rides — reference dedup surface,
dotneB/chess_lakehouse has no linkage operator; this is a north-star
extension), several independent key passes union for OR-amplified
recall (the banded-LSH pattern generalized to arbitrary record keys),
and per-field similarities are exact integer millionths so a DuckDB
oracle gates every number.

100 TB shape: each blocking pass is one groupBy on its key with the
bucket-size cap (skew = a non-discriminative key, dropped loudly via
``oversized_buckets`` accounting, never expanded); field scoring joins
grams/values only for CANDIDATE pairs. Nothing is quadratic in the
corpus, nothing driver-materialized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocking_pairs(
    df: DataFrame,
    id_col: str,
    key_sets: dict[str, Sequence[Column]],
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Multi-pass blocking: the DISTINCT union of unordered candidate
    pairs (id_a < id_b) whose records collide on ANY named blocking key
    — 'same (segment, nation, balance band) OR same name suffix'. Each
    pass is one groupBy-collapse + array-domain pair expansion
    (:func:`~chess_lakehouse_spark.operators.dedup.cooccur_pairs`);
    ``max_bucket_size`` drops non-discriminative buckets per pass
    (audit what a cap would drop with ``oversized_buckets`` on the same
    keys). Pair count is Σ C(|bucket|, 2): a FIXED-cardinality key
    grows buckets linearly with the corpus and pairs quadratically, so
    at scale grow the key cardinality with the corpus (more suffix
    chars, finer numeric bands) or rely on the cap — SCALE.md r13
    records the analysis. Records with a NULL in any of a pass's key columns are
    excluded from THAT pass (a NULL blocking key identifies nothing;
    pairing the all-NULL group would fabricate candidates) — stated
    contract; they still pair through any other pass whose keys they
    carry. Returns distinct (id_a, id_b)."""
    from chess_lakehouse_spark.operators.dedup import cooccur_pairs

    if not key_sets:
        raise ValueError("blocking_pairs: key_sets must name at least one pass")
    passes = []
    for name, cols in key_sets.items():
        cols = list(cols)
        if not cols:
            raise ValueError(f"blocking_pairs: pass {name!r} has no key columns")
        keyed = df.select(
            F.col(id_col),
            *[c.alias(f"__bk{i}") for i, c in enumerate(cols)],
        )
        for i in range(len(cols)):
            keyed = keyed.where(F.col(f"__bk{i}").isNotNull())
        passes.append(
            cooccur_pairs(
                keyed,
                [f"__bk{i}" for i in range(len(cols))],
                id_col,
                max_bucket_size=max_bucket_size,
            )
        )
    out = passes[0]
    for p in passes[1:]:
        out = out.unionByName(p)
    return out.distinct()


def pair_field_jaccard_ppm(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    field_col: str,
    q: int = 3,
    out_col: str = "jaccard_ppm",
) -> DataFrame:
    """Exact character-q-gram Jaccard (integer millionths, floor
    division) between the two records of each candidate pair on ONE
    string field — the per-field comparison vector entry of the
    Fellegi-Sunter pipeline. Grams are DISTINCT per record, built in the
    array domain (WholeStageCodegen, no Python); the intersection joins
    grams only for candidate pairs (the jaccard_verify shape), the
    union comes from per-record gram counts. A record whose field is
    NULL or shorter than ``q`` has an empty gram set: pairs whose union
    is empty score NULL (0/0 — incomparable, not 'identical'); pairs
    where exactly one side is empty score 0. The ppm rides
    DECIMAL(38,0) so gram counts near the BIGINT/1e6 cliff cannot abort
    under ANSI. Returns ``pairs`` + ``out_col`` (long, NULL-able)."""
    if q < 1:
        raise ValueError(f"pair_field_jaccard_ppm: q must be >= 1, got {q}")
    if out_col in pairs.columns:
        raise ValueError(
            f"pair_field_jaccard_ppm: pairs already carries {out_col!r} — "
            "pick a distinct out_col per field"
        )
    grams = (
        df.select(
            F.col(id_col),
            F.explode(
                F.when(
                    F.length(F.col(field_col)) >= q,
                    F.array_distinct(
                        F.transform(
                            F.sequence(
                                F.lit(1), F.length(F.col(field_col)) - (q - 1)
                            ),
                            lambda i: F.col(field_col).substr(i, F.lit(q)),
                        )
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("__gram"),
        )
    )
    counts = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    ga = grams.select(F.col(id_col).alias("id_a"), "__gram")
    gb = grams.select(F.col(id_col).alias("id_b"), "__gram")
    inter = (
        pairs.join(ga, "id_a")
        .join(gb, ["id_b", "__gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    jppm = F.expr(
        "CASE WHEN coalesce(__na, 0) + coalesce(__nb, 0)"
        "          - coalesce(__common, 0) > 0"
        " THEN CAST((CAST(coalesce(__common, 0) AS DECIMAL(38,0)) * 1000000)"
        "      div (coalesce(__na, 0) + coalesce(__nb, 0)"
        "           - coalesce(__common, 0)) AS BIGINT)"
        " END"
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(ca, "id_a", "left")
        .join(cb, "id_b", "left")
        .select(*pairs.columns, jppm.alias(out_col))
    )


def fs_weights_ppm(m_ppm: int, u_ppm: int) -> tuple[int, int]:
    """Fellegi-Sunter field log-weights in integer millionths from the
    field's conditional agreement probabilities m = P(agree | match) and
    u = P(agree | non-match), both in ppm: (agreement weight
    round(log2(m/u)·10⁶), disagreement weight round(log2((1-m)/(1-u))·10⁶)).
    The classic decision rule (Fellegi & Sunter JASA 1969 eq. 3.8 —
    sum of per-field log likelihood ratios) needs only these two
    constants per field; computing them HOST-SIDE once and riding them
    as integer literals keeps the distributed plan float-free — the
    engine and the SQL oracle consume the same baked integers, so
    cross-engine log() drift can never touch a gated number. A
    discriminative field has m > u (positive agreement weight, negative
    disagreement weight); inverted inputs are a spec error and refused."""
    import math

    if not 0 < u_ppm < m_ppm < 1_000_000:
        raise ValueError(
            "fs_weights_ppm: need 0 < u_ppm < m_ppm < 1000000, got "
            f"m={m_ppm} u={u_ppm}"
        )
    agree = round(math.log2(m_ppm / u_ppm) * 1_000_000)
    disagree = round(
        math.log2((1_000_000 - m_ppm) / (1_000_000 - u_ppm)) * 1_000_000
    )
    return agree, disagree


def fs_match_score(
    vectors: DataFrame,
    fields: Sequence[tuple[Column, int, int]],
    lower_ppm: int,
    upper_ppm: int,
    score_col: str = "score_ppm",
    decision_col: str = "decision",
) -> DataFrame:
    """Fellegi-Sunter match scoring over a comparison-vector frame (the
    decision stage completing the blocking → comparison → decision
    pipeline; Fellegi & Sunter JASA 1969): each field contributes its
    agreement weight when its agreement predicate is TRUE, its
    disagreement weight when FALSE, and 0 when NULL — the standard
    missing-field treatment (an incomparable field carries no evidence
    either way). The summed integer-ppm score cuts into the three
    Fellegi-Sunter regions: >= ``upper_ppm`` → 'match', <= ``lower_ppm``
    → 'nonmatch', else 'possible' (the clerical-review band).

    ``fields`` is a sequence of (agreement boolean Column, agree_wt_ppm,
    disagree_wt_ppm) — weights from :func:`fs_weights_ppm`. Pure column
    arithmetic over the candidate-pair frame: zero shuffles, zero joins,
    so the decision stage adds nothing to the blocking pipeline's cost
    at any scale. Returns ``vectors`` + (score_col long, decision_col
    string)."""
    if not fields:
        raise ValueError("fs_match_score: fields must name at least one field")
    if lower_ppm > upper_ppm:
        raise ValueError(
            f"fs_match_score: lower_ppm ({lower_ppm}) must be <= "
            f"upper_ppm ({upper_ppm})"
        )
    for col in (score_col, decision_col):
        if col in vectors.columns:
            raise ValueError(
                f"fs_match_score: vectors already carries {col!r} — "
                "pick distinct output names"
            )
    terms = [
        F.when(agree, F.lit(aw).cast("long"))
        .when(~agree, F.lit(dw).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for agree, aw, dw in fields
    ]
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    decision = (
        F.when(F.col(score_col) >= upper_ppm, F.lit("match"))
        .when(F.col(score_col) <= lower_ppm, F.lit("nonmatch"))
        .otherwise(F.lit("possible"))
    )
    return vectors.withColumn(score_col, score).withColumn(decision_col, decision)
