"""Structural NULL-group coverage for every group-keyed operator.

The r11->r12 silent-row-loss bugs (interleave_groups / upsample_epochs
dropping NULL-group rows through NULL-unsafe equi-joins) lived in
gated-GREEN operators because no fixture carries NULL group keys — the
oracle matched perfectly on inputs that never exercised the broken path.
This sweep makes the coverage structural instead of incidental (r12
verdict, Next-round #4): every operator that takes a group/strata/by
key runs against a frame WITH NULL group keys, under the one property a
NULL-correct implementation must satisfy:

    SUBSTITUTION COMMUTES — running the operator on the NULL-bearing
    frame, then renaming NULL -> sentinel in the output, produces
    exactly the rows of running it on the frame with NULL pre-renamed
    to a fresh sentinel value. (NULL is just another group.)

A NULL-unsafe equi-join (the r12 bug class) breaks this loudly: the
sentinel run keeps the rows, the NULL run silently drops them, and the
row sets differ. The property also catches NULL collapsing INTO another
group, NULL producing NULL outputs where the sentinel produces values,
and aggregators omitting the NULL group's output row.

The property requires the operator's math to depend on the group key
only through grouping identity (never hashing the group VALUE into
row-level decisions) — true for every operator here by construction;
an operator that legitimately keys row hashes on the group value would
need a bespoke test instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SENTINEL = "zz_null_sentinel"


def _docs(spark):
    # 3 named groups + a NULL group, unequal sizes, distinct values
    rows = []
    did = 0
    for g, n in (("alpha", 6), ("beta", 4), (None, 5), ("gamma", 3)):
        for i in range(n):
            did += 1
            rows.append((did, g, 100 + did * 7, (did * 13) % 50 + 1))
    return spark.createDataFrame(
        rows, "doc_id long, source string, score long, n_tokens long"
    )


def _subst(df, col="source"):
    return df.withColumn(col, F.coalesce(F.col(col), F.lit(SENTINEL)))


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def _assert_commutes(op, df, group_col="source"):
    """op(df) with NULL->sentinel applied AFTER == op(df with NULL
    renamed BEFORE): NULL is just another group."""
    out_null = _subst(op(df), group_col)
    out_sent = op(_subst(df, group_col))
    assert _rows(out_null) == _rows(out_sent)
    # and the NULL group's rows actually reached the output
    assert out_sent.where(F.col(group_col) == SENTINEL).count() > 0


def test_top_n_per_group_null_group(spark):
    from chess_lakehouse_spark.operators.sampling import top_n_per_group

    df = _docs(spark)
    _assert_commutes(lambda d: top_n_per_group(d, "doc_id", "source", 3), df)
    # n >= every group size: row-preserving including the NULL group
    assert top_n_per_group(df, "doc_id", "source", 100).count() == df.count()


def test_temperature_sample_null_group(spark):
    from chess_lakehouse_spark.operators.sampling import temperature_sample

    _assert_commutes(
        lambda d: temperature_sample(d, "doc_id", "source", alpha=0.5), _docs(spark)
    )


def test_token_budget_sample_null_group(spark):
    from chess_lakehouse_spark.operators.sampling import token_budget_sample

    _assert_commutes(
        lambda d: token_budget_sample(
            d, "doc_id", "source", F.col("n_tokens"), budget=60
        ),
        _docs(spark),
    )


def test_stratified_hash_sample_null_stratum(spark):
    from chess_lakehouse_spark.operators.sampling import stratified_hash_sample

    # NULL stratum is not in the rates dict -> default_rate path; with
    # default_rate=1.0 every NULL row must survive
    df = _docs(spark)
    out = stratified_hash_sample(
        df, "doc_id", "source", {"alpha": 1.0}, default_rate=1.0
    )
    assert out.count() == df.count()
    _assert_commutes(
        lambda d: stratified_hash_sample(
            d, "doc_id", "source", {"alpha": 0.5}, default_rate=1.0
        ),
        df,
    )


def test_interleave_groups_null_group(spark):
    """interleave_groups' ``pos`` legitimately depends on the group
    NAME (groups tie-break by name at each round-robin step, and NULL
    sorts NULLS-FIRST — documented), so full substitution-commutation
    is the wrong property here. What must hold: row preservation (the
    r12 bug: NULL rows vanished) and ``seq`` commutation (within-group
    order never depends on the group name)."""
    from chess_lakehouse_spark.operators.sampling import interleave_groups

    df = _docs(spark)
    out = interleave_groups(df, "doc_id", "source")
    assert out.count() == df.count()
    _assert_commutes(
        lambda d: interleave_groups(d, "doc_id", "source").drop("pos"), df
    )


def test_upsample_epochs_null_group(spark):
    from chess_lakehouse_spark.operators.sampling import upsample_epochs

    df = _docs(spark)
    _assert_commutes(
        lambda d: upsample_epochs(d, "doc_id", "n_tokens", "source", budget=400),
        df,
    )


def test_winsorize_null_group(spark):
    from chess_lakehouse_spark.operators.relational import winsorize

    df = _docs(spark)
    for exact in (True, False):
        out = winsorize(df, "doc_id", "source", "score", exact=exact)
        assert out.count() == df.count()
        _assert_commutes(
            lambda d: winsorize(d, "doc_id", "source", "score", exact=exact), df
        )


def test_score_buckets_null_group(spark):
    from chess_lakehouse_spark.operators.relational import score_buckets

    df = _docs(spark)
    for exact in (True, False):
        out = score_buckets(df, "doc_id", "score", 3, exact=exact, by=["source"])
        assert out.count() == df.count()
        assert out.where(F.col("bucket").isNull()).count() == 0
        _assert_commutes(
            lambda d: score_buckets(d, "doc_id", "score", 3, exact=exact, by=["source"]),
            df,
        )


def test_exact_quantiles_null_group(spark):
    from chess_lakehouse_spark.operators.relational import exact_quantiles

    _assert_commutes(
        lambda d: exact_quantiles(d, "score", [0.5, 0.9], by=["source"]),
        _docs(spark),
    )


def test_weighted_quantiles_null_group(spark):
    from chess_lakehouse_spark.operators.relational import weighted_quantiles

    _assert_commutes(
        lambda d: weighted_quantiles(d, "score", "n_tokens", [0.5], by=["source"]),
        _docs(spark),
    )


def test_robust_zscore_flags_null_group(spark):
    from chess_lakehouse_spark.operators.relational import robust_zscore_flags

    df = _docs(spark)
    out = robust_zscore_flags(df, "score", by=["source"])
    assert out.count() == df.count()
    _assert_commutes(lambda d: robust_zscore_flags(d, "score", by=["source"]), df)


def test_zscore_outliers_null_group(spark):
    from chess_lakehouse_spark.operators.relational import zscore_outliers

    _assert_commutes(
        lambda d: zscore_outliers(d, "doc_id", "source", "score", z_threshold=0.5),
        _docs(spark),
    )


def test_quantile_normalize_null_group(spark):
    from chess_lakehouse_spark.operators.relational import quantile_normalize

    df = _docs(spark)
    out = quantile_normalize(df, "doc_id", "score", "source")
    assert out.count() == df.count()
    _assert_commutes(lambda d: quantile_normalize(d, "doc_id", "score", "source"), df)


def test_top_k_per_group_null_group(spark):
    from chess_lakehouse_spark.operators.relational import top_k_per_group

    _assert_commutes(
        lambda d: top_k_per_group(
            d, ["source"], [F.desc("score"), F.asc("doc_id")], 2
        ),
        _docs(spark),
    )


def test_rank_sketch_null_group(spark):
    """rank_sketch_build/quantiles (r14): the group-meta broadcast join
    and the audit join are NULL-safe; the row hash keys on doc_id only,
    so substitution commutes. Covers build, merge and serve."""
    from chess_lakehouse_spark.operators.sketches import (
        rank_sketch_build,
        rank_sketch_merge,
        rank_sketch_quantiles,
    )

    df = _docs(spark)
    _assert_commutes(
        lambda d: rank_sketch_build(d, "doc_id", "score", 3, by=["source"]), df
    )
    _assert_commutes(
        lambda d: rank_sketch_merge(
            [
                rank_sketch_build(
                    d.where(F.col("doc_id") % 2 == i),
                    "doc_id",
                    "score",
                    3,
                    by=["source"],
                )
                for i in range(2)
            ],
            k=3,
            by=["source"],
        ),
        df,
    )
    _assert_commutes(
        lambda d: rank_sketch_quantiles(
            rank_sketch_build(d, "doc_id", "score", 3, by=["source"]),
            "doc_id",
            "score",
            [500_000],
            by=["source"],
        ),
        df,
    )
