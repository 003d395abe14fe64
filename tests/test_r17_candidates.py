"""Staging tests for the r16/r17 window candidates built in the r15
build session (suite/llm.py STAGED_CANDIDATES): two-scale exact parity
against their suite-defined DuckDB oracles, plan-shape guards, and
operator-level semantics pins.

- knn_ivfpq_stream — streaming maintenance of the published IVF+PQ lake
  index (streaming/jobs.py: stream_ivfpq_append, the twelfth stateful
  loop): base publish carries a third of the corpus, the rest arrives
  as micro-batches folded in O(delta) with the index's own sidecar
  models; serves KNN_IVFPQ_ORACLE VERBATIM — an ingestion path may
  never change the served truth.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _oracle_rows(sf_dir: str, tables: list[str], sql: str):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    con.close()
    return rows


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_clean_plan(df):
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------- knn_ivfpq_stream


@pytest.mark.parametrize("sf_dir", SCALES)
def test_knn_ivfpq_stream_matches_oracle_two_scales(spark, sf_dir):
    """The streamed index serves the SAME oracle as the batch publish,
    verbatim — the shared-oracle discipline makes 'ingestion cannot
    change the served truth' machine-checked."""
    from chess_lakehouse_spark.suite.llm import (
        KNN_IVFPQ_ORACLE,
        STAGED_CANDIDATES,
        q_knn_ivfpq_stream,
    )

    assert STAGED_CANDIDATES["knn_ivfpq_stream"][1] is KNN_IVFPQ_ORACLE
    sdf = q_knn_ivfpq_stream(spark, sf_dir)
    assert dict(sdf.dtypes) == {
        "query_id": "bigint",
        "cand_id": "bigint",
        "sim": "double",
        "rk": "int",
    }
    _assert_clean_plan(sdf)
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["embeddings"], KNN_IVFPQ_ORACLE)


def test_stream_ivfpq_append_equals_batch_publish_and_replay(spark, tmp_path):
    """Lifecycle pin: base publish over a third of the vectors + the
    streaming append of the rest serves bit-identically to ONE batch
    publish over everything; a restart with no new files is a no-op;
    a replayed (re-delivered) micro-batch partition is value-identical."""
    import glob
    import shutil

    from chess_lakehouse_spark.catalog import load_table
    from chess_lakehouse_spark.operators.similarity import (
        append_ivfpq_index,
        kmeans_fit,
        pq_train,
        publish_ivfpq_index,
        search_ivfpq_index,
    )
    from chess_lakehouse_spark.streaming.jobs import stream_ivfpq_append

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=1, seed=0)
    books = pq_train(emb, "vec_id", "embedding", m=4, k=4, iters=1, seed=0)

    streamed = str(tmp_path / "streamed")
    publish_ivfpq_index(
        emb.where(F.col("vec_id") % 3 == 0), streamed,
        "vec_id", "embedding", cents, books, batch_id="base",
    )
    drops = tmp_path / "drops"
    drops.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def land(name, df):
        staging = tmp_path / f"_stage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        shutil.copy(
            glob.glob(f"{staging}/part-*.parquet")[0], drops / f"{name}.parquet"
        )

    def run():
        static = spark.read.parquet(str(drops))
        stream = spark.readStream.schema(static.schema).parquet(str(drops))
        stream_ivfpq_append(stream, streamed, ckpt, "vec_id", "embedding")

    land("d1", emb.where(F.col("vec_id") % 3 == 1))
    run()
    land("d2", emb.where(F.col("vec_id") % 3 == 2))
    run()

    batch = str(tmp_path / "batch")
    publish_ivfpq_index(
        emb, batch, "vec_id", "embedding", cents, books, batch_id="base"
    )

    probes = emb.where(F.col("vec_id") < 3)

    def serve(idx):
        return sorted(
            tuple(r)
            for r in search_ivfpq_index(
                spark, idx, probes, "vec_id", "embedding",
                nprobe=2, pool=10, k=5,
            ).collect()
        )

    want = serve(batch)
    assert serve(streamed) == want and len(want) > 0

    # restart with nothing new: checkpoint makes it a no-op
    run()
    assert serve(streamed) == want

    # corrected re-delivery: re-appending an existing batch_id REPLACES
    # that partition value-identically
    append_ivfpq_index(
        emb.where(F.col("vec_id") % 3 == 1), streamed,
        "vec_id", "embedding", batch_id="b0",
    )
    assert serve(streamed) == want


# -------------------------------------------------------- graph_communities


@pytest.mark.parametrize("sf_dir", SCALES)
def test_graph_communities_matches_oracle_two_scales(spark, sf_dir):
    from chess_lakehouse_spark.suite.llm import (
        GRAPH_COMMUNITIES_ORACLE,
        STAGED_CANDIDATES,
        q_graph_communities,
    )

    assert STAGED_CANDIDATES["graph_communities"][1] is GRAPH_COMMUNITIES_ORACLE
    sdf = q_graph_communities(spark, sf_dir)
    assert dict(sdf.dtypes) == {
        "node": "bigint",
        "community": "bigint",
        "n_members": "bigint",
    }
    _assert_clean_plan(sdf)
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["documents"], GRAPH_COMMUNITIES_ORACLE)
    # every node labels into exactly one community; sizes are consistent
    nodes = [r[0] for r in srows]
    assert len(nodes) == len(set(nodes))
    from collections import Counter

    by_comm = Counter(r[1] for r in srows)
    assert all(by_comm[c] == m for _, c, m in srows)


def test_label_propagation_semantics(spark):
    """Mode-vote semantics: a bridge between two triangles does NOT merge
    them (each side's internal majority outvotes the single bridge
    neighbor) while connected_components floods the whole thing into one
    — the community-vs-component distinction the operator exists for.
    Plus: determinism under repartitioning and the validation guards."""
    from chess_lakehouse_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    # two triangles {0,1,2} and {10,11,12} joined by the bridge 2-10
    edges = [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12), (2, 10)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, n_iter=4).collect()
    }
    # left triangle coalesces on 0, right on 10 — two communities survive
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12]} == {10}
    cc = {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }
    assert len(set(cc.values())) == 1  # CC merges across the bridge

    # partitioning invariance: same labelling from any physical layout
    got2 = {
        r["node"]: r["community"]
        for r in label_propagation(df.repartition(7), n_iter=4).collect()
    }
    assert got2 == got

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_iter must be >= 1"):
        label_propagation(df, n_iter=0)
    with _pytest.raises(ValueError, match="integral id"):
        label_propagation(
            spark.createDataFrame([("a", "b")], "id_a string, id_b string"),
            n_iter=1,
        )


# ----------------------------------------------------------- unigram_train


@pytest.mark.parametrize("sf_dir", SCALES)
def test_unigram_train_matches_oracle_two_scales(spark, sf_dir):
    from chess_lakehouse_spark.suite.llm import (
        STAGED_CANDIDATES,
        UNIGRAM_TRAIN_ORACLE,
        q_unigram_train,
    )

    assert STAGED_CANDIDATES["unigram_train"][1] is UNIGRAM_TRAIN_ORACLE
    sdf = q_unigram_train(spark, sf_dir)
    assert dict(sdf.dtypes) == {"rk": "int", "piece": "string", "n": "bigint"}
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["documents"], UNIGRAM_TRAIN_ORACLE)
    # coverage contract: every corpus character is in the vocabulary
    pieces = {p for _, p, _ in srows}
    chars = {c for _, p, _ in srows for c in p}
    assert chars <= pieces


def test_unigram_trainer_semantics(spark):
    """Viterbi picks the cheaper multi-char piece over the char sum,
    EM usage counts drive the final ranking, the result is invariant
    under repartitioning, the segmenter round-trips (concat of pieces
    rebuilds each word), and validation guards fire."""
    from chess_lakehouse_spark.functions.unigram import (
        unigram_lm_train,
        unigram_segment,
    )

    rows = [(i, "abab cd") for i in range(50)] + [(99, "abab abab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = unigram_lm_train(
        df, "text", max_piece_len=3, n_seed_multi=10, em_iters=2,
        n_keep_multi=4,
    )
    d = dict(vocab)
    # 'ab' dominates: every 'abab' word is two 'ab' pieces, never chars
    assert "ab" in d and d["ab"] >= 2 * 51
    # coverage: all chars present even when unused by best segmentations
    assert {"a", "b", "c", "d"} <= set(d)

    v2 = unigram_lm_train(
        df.repartition(7), "text", max_piece_len=3, n_seed_multi=10,
        em_iters=2, n_keep_multi=4,
    )
    assert v2 == vocab

    seg = unigram_segment(df.limit(1), "text", vocab, 3)
    [r] = seg.select("pieces").collect()
    assert "".join(r["pieces"]) == "ababcd"

    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_lm_train(df, "text", max_piece_len=1)
    with pytest.raises(ValueError, match="em_iters"):
        unigram_lm_train(df, "text", em_iters=0)
    with pytest.raises(ValueError, match="empty vocabulary"):
        unigram_segment(df, "text", [], 3)
