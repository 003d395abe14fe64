"""Focused pins for the r15 optimization-round internals changes
(OPTIMIZATION_r15.md): each test locks the EQUIVALENCE contract of a
rewritten operator internal — the oracle gates already pin end-to-end
values; these pin the specific internal against its pre-optimization
form so a future edit cannot silently drift it.
"""

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------- local_df


def test_local_df_one_slice_and_value_parity(spark):
    """session.local_df builds ONE partition by default (the r15 fix:
    default createDataFrame slices pickled rows defaultParallelism ways,
    and a single-task consumer pays one sequential Python-worker round
    trip per slice) and converts values identically."""
    from chess_lakehouse_spark.session import local_df

    rows = [(1, "a", 1.5), (2, None, -0.25), (3, "c", 0.0)]
    schema = "i int, s string, x double"
    got = local_df(spark, rows, schema)
    assert got.rdd.getNumPartitions() == 1
    ref = spark.createDataFrame(rows, schema)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    assert got.schema == ref.schema
    # empty input stays valid (createDataFrame path)
    assert local_df(spark, [], schema).count() == 0
    # explicit slice count honored
    assert local_df(spark, rows, schema, n_slices=2).rdd.getNumPartitions() == 2


# ------------------------------------------------------ schema memoization


def test_load_table_schema_memo(spark, tmp_path):
    """catalog.load_table serves the schema from the per-(application,
    path) memo after the first footer inference, and the memoized read
    matches a fresh inference exactly."""
    from chess_lakehouse_spark import catalog

    sf_dir = str(tmp_path)
    spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("int").alias("v")
    ).write.parquet(f"{sf_dir}/customer.parquet")

    df1 = catalog.load_table(spark, sf_dir, "customer")
    key = (spark.sparkContext.applicationId, catalog.table_path(sf_dir, "customer"))
    assert key in catalog._SCHEMA_CACHE
    df2 = catalog.load_table(spark, sf_dir, "customer")
    assert df2.schema == df1.schema
    assert df2.schema == spark.read.parquet(f"{sf_dir}/customer.parquet").schema
    assert sorted(map(tuple, df2.collect())) == sorted(map(tuple, df1.collect()))


# ------------------------------------------------- pq_train fused == split


def test_pq_train_fused_equals_per_slice_kmeans(spark):
    """The r15 fused pq_train (all m codebooks updated in ONE pass per
    iteration) must return bit-identical books to the pre-r15 form (one
    independent kmeans_fit per slice) — same seeded init, same exact-
    DECIMAL mean arithmetic, only the job structure changed."""
    from chess_lakehouse_spark.operators.similarity import (
        as_double,
        kmeans_fit,
        pq_train,
    )

    rows = [
        (i, [((i * 7 + j * 13) % 29) / 7.0 - 2.0 for j in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m, k, iters, seed = 2, 4, 2, 3
    fused = pq_train(emb, "vec_id", "embedding", m=m, k=k, iters=iters, seed=seed)

    d = 8 // m
    split = []
    for s in range(m):
        sliced = emb.select(
            "vec_id",
            F.slice(as_double(F.col("embedding")), s * d + 1, d).alias("__sub"),
        )
        split.append(kmeans_fit(sliced, "vec_id", "__sub", k=k, iters=iters, seed=seed))
    assert fused == split

    with pytest.raises(ValueError, match="divide"):
        pq_train(emb, "vec_id", "embedding", m=3)
    with pytest.raises(ValueError, match="empty"):
        pq_train(emb.where(F.lit(False)), "vec_id", "embedding", m=2)


# ------------------------------------- bm25 window-df == materialized dfreq


def test_bm25_window_df_equals_materialized_dfreq(spark):
    """_bm25_score_rank(dfreq=None) — df via a count-window over the
    postings frame (the r15 duplicate-subtree fix) — must score exactly
    like the explicit dfreq-table path bm25_from_index still uses."""
    from chess_lakehouse_spark.functions.text import _bm25_score_rank

    postings = spark.createDataFrame(
        [(1, "a", 2), (1, "b", 1), (2, "a", 1), (3, "b", 4), (3, "c", 1)],
        "doc_id long, t string, tf long",
    )
    lengths = spark.createDataFrame(
        [(1, 3), (2, 1), (3, 5)], "doc_id long, n_d long"
    )
    q_terms = spark.createDataFrame(
        [(10, "a"), (10, "b"), (11, "c")], "query_id long, t string"
    )
    dfreq = postings.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n_docs, total_len = F.lit(3), F.lit(9)

    via_window = _bm25_score_rank(
        q_terms, postings, None, lengths, n_docs, total_len, 10, 1.2, 0.75, 6
    )
    via_table = _bm25_score_rank(
        q_terms, postings, dfreq, lengths, n_docs, total_len, 10, 1.2, 0.75, 6
    )
    assert sorted(map(tuple, via_window.collect())) == sorted(
        map(tuple, via_table.collect())
    )


# --------------------------------- sparse cosine window-norms equivalence


def test_sparse_cosine_window_norms_match_groupby_norms(spark):
    """The r15 window-carried norms must reproduce the pre-r15 separate
    norm table exactly: cosine of each emitted pair equals the directly
    computed round(dot / sqrt(n2a*n2b), 6) from groupBy norms."""
    from chess_lakehouse_spark.operators.similarity import sparse_cosine_pairs

    rows = [
        (1, "x", 1.0), (1, "y", 2.0),
        (2, "x", 1.0), (2, "y", 2.0),
        (3, "y", 1.0), (3, "z", 3.0),
        (4, "z", 3.0),
    ]
    w = spark.createDataFrame(rows, "id long, term string, wt double")
    got = {
        (r.id_a, r.id_b): r.sim
        for r in sparse_cosine_pairs(w, "id", "term", "wt", threshold=0.0).collect()
    }
    import math

    vecs = {}
    for i, t, x in rows:
        vecs.setdefault(i, {})[t] = x
    for (a, b), sim in got.items():
        va, vb = vecs[a], vecs[b]
        dp = sum(va[t] * vb[t] for t in set(va) & set(vb))
        n2a = sum(x * x for x in va.values())
        n2b = sum(x * x for x in vb.values())
        assert sim == pytest.approx(round(dp / math.sqrt(n2a * n2b), 6), abs=0)
    # pairs exist only where a term is shared and id_a < id_b
    assert (1, 2) in got and (4, 4) not in got
    assert all(a < b for a, b in got)
