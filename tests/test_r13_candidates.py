"""Staging tests for r13 window candidates built in r12
(suite/llm.py STAGED_CANDIDATES): two-scale exact parity against their
suite-defined DuckDB oracles, driver-safe output types, plan-shape
guards, and operator-level semantics pins.

- dedup_semdedup — the full SemDeDup recipe (Abbas et al. 2023) as one
  query: k-means-trained clusters (the q_knn_ivf_kmeans trainer) ->
  within-cluster cosine near-dup -> min-id canonical keep.
- tokenizer_fertility — subword tokens per whitespace word, per source
  (Ács 2019 / BLOOM tokenizer-eval metric), over the gated BPE path;
  the oracle derives token counts from the shared training-chain
  unroll, whose apply==fold equivalence is pinned directly here.
- stream_interval_join — a REAL watermarked stream-stream interval
  join drained end to end through Structured Streaming; the oracle is
  the batch interval join (stream == batch for inner joins over
  complete input).
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


@pytest.mark.parametrize("sf_dir", SCALES)
def test_dedup_semdedup_candidate_matches_oracle_two_scales(spark, sf_dir):
    from chess_lakehouse_spark.suite.llm import (
        DEDUP_SEMDEDUP_ORACLE,
        q_dedup_semdedup,
    )

    sdf = q_dedup_semdedup(spark, sf_dir)
    assert dict(sdf.dtypes) == {"vec_id": "bigint", "list_id": "int"}
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["embeddings"], DEDUP_SEMDEDUP_ORACLE)
    # survivors are unique ids; every list_id is a trained cid in [0, 8)
    assert len({r[0] for r in srows}) == len(srows)
    assert {r[1] for r in srows} <= set(range(8))


def test_dedup_semdedup_plan_never_all_pairs(spark):
    plan_text = None
    from chess_lakehouse_spark.suite.llm import q_dedup_semdedup

    plan_text = _plan(q_dedup_semdedup(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan_text
    assert "BatchEvalPython" not in plan_text  # no row-at-a-time Python
    # pair generation is the list_id equi-join over the persisted
    # assignment frame (InMemoryTableScan), never an all-pairs compare
    assert "InMemoryTableScan" in plan_text


def test_dedup_semdedup_blocked_recall_vs_unblocked(spark):
    """The recall note the staging contract requires: clustering can only
    SPLIT ε-balls across cluster boundaries, so the blocked form drops a
    subset of what the unblocked all-pairs form drops (survivors are a
    superset) — quantified here on the fixture corpus."""
    from chess_lakehouse_spark.operators.similarity import (
        cosine_near_pairs,
        kmeans_fit,
        semantic_dedup,
    )
    from chess_lakehouse_spark.suite.llm import (
        KMEANS_ITERS,
        KMEANS_K,
        KMEANS_SEED,
        SEMANTIC_THRESHOLD,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_fit(
        emb, "vec_id", "embedding",
        k=KMEANS_K, iters=KMEANS_ITERS, seed=KMEANS_SEED,
    )
    blocked = {
        r["vec_id"]
        for r in semantic_dedup(
            emb, "vec_id", "embedding",
            threshold=SEMANTIC_THRESHOLD, centroids=cents,
        ).collect()
    }
    # unblocked ground truth: drop every id with a LOWER-id neighbor at
    # cosine >= t anywhere in the corpus (block = constant)
    allp = cosine_near_pairs(
        emb.withColumn("one", F.lit(1)),
        "vec_id", "embedding", "one", SEMANTIC_THRESHOLD,
    )
    dropped_unblocked = {r["id_b"] for r in allp.select("id_b").distinct().collect()}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    unblocked = all_ids - dropped_unblocked
    # superset relation: blocking never drops MORE than all-pairs
    assert unblocked <= blocked
    # and the fixture corpus actually exercises both regimes: some dups
    # are caught within clusters, some straddle a boundary
    n_caught = len(all_ids) - len(blocked)
    n_true = len(all_ids) - len(unblocked)
    assert n_true > 0 and 0 < n_caught <= n_true
    # pair-recall of the duplicate DETECTIONS (the paper's trade)
    recall_ppm = n_caught * 1_000_000 // n_true
    assert recall_ppm >= 500_000, (
        f"blocked dedup caught {n_caught}/{n_true} dups ({recall_ppm} ppm) — "
        "the fixture clustering should catch most duplicates"
    )


@pytest.mark.parametrize("sf_dir", SCALES)
def test_tokenizer_fertility_candidate_matches_oracle_two_scales(spark, sf_dir):
    from chess_lakehouse_spark.suite.llm import (
        TOKENIZER_FERTILITY_ORACLE,
        q_tokenizer_fertility,
    )

    sdf = q_tokenizer_fertility(spark, sf_dir)
    assert dict(sdf.dtypes) == {
        "source": "string",
        "n_docs": "bigint",
        "n_words": "bigint",
        "n_tokens": "bigint",
        "fertility_ppm": "bigint",
    }
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["documents"], TOKENIZER_FERTILITY_ORACLE)
    for _src, n_docs, n_words, n_tokens, fppm in srows:
        # BPE can only merge: tokens per word lies in [1, chars+1]; with
        # the EOW marker and 8 merges fertility must stay >= 1.0 and the
        # ratio must be the exact integer div
        assert n_docs > 0 and n_words > 0
        assert n_tokens >= n_words
        assert fppm == n_tokens * 1_000_000 // n_words


def test_tokenizer_fertility_apply_equals_training_fold(spark):
    """The oracle's load-bearing equivalence: for words OF the training
    corpus, rank-priority bpe_apply equals the training fold's final
    symbol state (one leftmost-non-overlap sweep per rank in training
    order) — checked directly against the Spark trainer + tokenizer on
    the fixture corpus."""
    from chess_lakehouse_spark.functions.bpe import bpe_apply, bpe_train
    from chess_lakehouse_spark.suite.llm import BPE_MERGES

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe_train(docs, "text", n_merges=BPE_MERGES)
    toks = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_apply(docs, "doc_id", "text", merges).collect()
    }
    # training-fold replay in plain Python: apply each merge once, in
    # rank order, leftmost-non-overlapping per word
    def fold_word(w):
        syms = list(w)
        if syms:
            syms[-1] += "</w>"
        for pa, pb in merges:
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == pa and syms[j + 1] == pb:
                    out.append(pa + pb)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return syms

    for r in docs.select("doc_id", "text").collect():
        want = [t for w in (r["text"].split() if r["text"] else [])
                for t in fold_word(w)]
        assert toks[r["doc_id"]] == want, r["doc_id"]


@pytest.mark.parametrize("sf_dir", SCALES)
def test_stream_interval_join_candidate_matches_oracle_two_scales(spark, sf_dir):
    """The streaming plan's output — drained through a real
    watermarked stream-stream interval join — equals the batch interval
    join the oracle runs (stream == batch for an inner join over
    complete input)."""
    from chess_lakehouse_spark.suite.llm import (
        STREAM_INTERVAL_JOIN_ORACLE,
        q_stream_interval_join,
    )

    sdf = q_stream_interval_join(spark, sf_dir)
    assert dict(sdf.dtypes) == {
        "user_id": "bigint",
        "imp_id": "bigint",
        "click_id": "bigint",
        "its_us": "bigint",
        "cts_us": "bigint",
    }
    srows = sorted(tuple(r) for r in sdf.collect())
    assert len(srows) > 0
    assert srows == _oracle_rows(sf_dir, ["events"], STREAM_INTERVAL_JOIN_ORACLE)
    # the attribution bound actually binds: every match inside the window
    for _u, _i, _c, its, cts in srows:
        assert its <= cts <= its + 1800 * 1_000_000
    # re-invocation (bench reps / verify): fresh checkpoint per run means
    # the second drain reproduces the identical set
    again = sorted(tuple(r) for r in q_stream_interval_join(spark, sf_dir).collect())
    assert again == srows
