"""Cross-set semantic decontamination
(operators/similarity.py: semantic_contamination / decontaminate_semantic)
and the r10 staging candidate q_contamination_semantic against its
suite-defined oracle (SEM_CONTAM_ORACLE — band literals generated from
the same SEM_CONTAM_BANDS planes the Spark chain compiles)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.similarity import (
    cosine,
    decontaminate_semantic,
    semantic_contamination,
)
from chess_lakehouse_spark.suite.llm import (
    SEM_CONTAM_BANDS,
    SEM_CONTAM_MOD,
    SEM_CONTAM_ORACLE,
    SEM_CONTAM_THRESHOLD,
    q_contamination_semantic,
)

SF = "/root/testdata/sf0.001"


def _sets(spark, sf_dir=SF):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ev = emb.where(F.col("vec_id") % SEM_CONTAM_MOD == 0)
    co = emb.where(F.col("vec_id") % SEM_CONTAM_MOD != 0)
    return co, ev


def _brute_pairs(spark, threshold):
    """Reference: exhaustive cross-set cosine (test-only crossJoin)."""
    co, ev = _sets(spark)
    a = co.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("va"))
    b = ev.select(F.col("vec_id").alias("eval_id"), F.col("embedding").alias("vb"))
    return {
        (r["corpus_id"], r["eval_id"]): r["sim"]
        for r in a.crossJoin(b)
        .select("corpus_id", "eval_id", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .where(F.col("sim") >= threshold)
        .collect()
    }


def test_flagged_is_subset_of_brute_force_with_good_recall(spark):
    """Banded candidates can only MISS pairs, never invent them; the
    4x3-plane banding must keep recall usable at the gate threshold
    (measured 11/16 at this fixture — pin a floor, not the point value)."""
    brute = _brute_pairs(spark, SEM_CONTAM_THRESHOLD)
    co, ev = _sets(spark)
    flagged = {
        (r["corpus_id"], r["eval_id"]): r["sim"]
        for r in semantic_contamination(
            co, ev, "vec_id", "embedding", SEM_CONTAM_THRESHOLD,
            plane_sets=SEM_CONTAM_BANDS,
        ).collect()
    }
    assert set(flagged) <= set(brute)
    assert len(flagged) >= 0.6 * len(brute)
    for k, sim in flagged.items():
        assert sim == brute[k]


def test_block_col_path_equals_brute_force_within_blocks(spark):
    """With a shared block column the result is exactly the brute-force
    pairs restricted to equal blocks."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ev = emb.where(F.col("vec_id") % SEM_CONTAM_MOD == 0)
    co = emb.where(F.col("vec_id") % SEM_CONTAM_MOD != 0)
    got = {
        (r["corpus_id"], r["eval_id"])
        for r in semantic_contamination(
            co, ev, "vec_id", "embedding", 0.3, block_col="label"
        ).collect()
    }
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    brute = _brute_pairs(spark, 0.3)
    want = {k for k in brute if labels[k[0]] == labels[k[1]]}
    assert got == want


def test_single_band_planes_equals_plane_sets_of_one(spark):
    co, ev = _sets(spark)
    a = sorted(
        map(tuple, semantic_contamination(
            co, ev, "vec_id", "embedding", 0.3, planes=SEM_CONTAM_BANDS[0]
        ).collect())
    )
    b = sorted(
        map(tuple, semantic_contamination(
            co, ev, "vec_id", "embedding", 0.3, plane_sets=[SEM_CONTAM_BANDS[0]]
        ).collect())
    )
    assert a == b


def test_multi_band_pairs_are_unique(spark):
    """A pair matching several bands must appear ONCE."""
    co, ev = _sets(spark)
    rows = semantic_contamination(
        co, ev, "vec_id", "embedding", SEM_CONTAM_THRESHOLD,
        plane_sets=SEM_CONTAM_BANDS,
    ).collect()
    keys = [(r["corpus_id"], r["eval_id"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_blocking_params_are_exclusive(spark):
    co, ev = _sets(spark)
    with pytest.raises(ValueError, match="exactly one"):
        semantic_contamination(
            co, ev, "vec_id", "embedding", 0.4,
            block_col="label", planes=SEM_CONTAM_BANDS[0],
        )
    with pytest.raises(ValueError, match="exactly one"):
        semantic_contamination(co, ev, "vec_id", "embedding", 0.4)


def test_decontaminate_removes_exactly_the_flagged_corpus_ids(spark):
    co, ev = _sets(spark)
    flagged_ids = {
        r["corpus_id"]
        for r in semantic_contamination(
            co, ev, "vec_id", "embedding", SEM_CONTAM_THRESHOLD,
            plane_sets=SEM_CONTAM_BANDS,
        ).collect()
    }
    assert flagged_ids  # fixture must exercise the anti-join
    clean = decontaminate_semantic(
        co, ev, "vec_id", "embedding", SEM_CONTAM_THRESHOLD,
        plane_sets=SEM_CONTAM_BANDS,
    )
    assert clean.columns == co.columns
    kept = {r["vec_id"] for r in clean.select("vec_id").collect()}
    allc = {r["vec_id"] for r in co.select("vec_id").collect()}
    assert kept == allc - flagged_ids


# ---------------------------------------------------------------------------
# r10 staging candidate: q_contamination_semantic vs suite oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_contamination_semantic_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof: exact values, driver-safe types, both
    local scales."""
    sdf = q_contamination_semantic(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == ["bigint", "bigint", "double"]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    rel = con.sql(SEM_CONTAM_ORACLE)
    assert all(str(t) in {"BIGINT", "DOUBLE"} for t in rel.types)
    drows = sorted(tuple(r) for r in con.execute(SEM_CONTAM_ORACLE).fetchall())
    con.close()
    assert len(srows) > 0
    assert srows == drows


def test_oracle_constants_are_in_sync():
    from chess_lakehouse_spark.suite.llm import semantic_contamination_oracle_sql

    assert semantic_contamination_oracle_sql() == SEM_CONTAM_ORACLE
    assert f"% {SEM_CONTAM_MOD} = 0" in SEM_CONTAM_ORACLE
    assert str(SEM_CONTAM_THRESHOLD) in SEM_CONTAM_ORACLE
