"""Distributed PCA (tree-aggregated Gram matrix) vs a numpy reference.

This is a rows-only-class operator (float tree-reduction: the Gram's low
bits depend on partition boundaries, so no SQL oracle applies); the pins
are numpy agreement within tolerance, the deterministic eigen
conventions, and the exact map-side projection fold."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.similarity import (
    embedding_pca,
    project_embeddings,
)


def _np_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / (len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:k]
    comps, var = [], []
    for idx in order:
        v = evecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append(v)
        var.append(evals[idx])
    return np.asarray(comps), np.asarray(var)


def test_pca_matches_numpy_on_fixtures(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    comps, var = embedding_pca(emb, "embedding", n_components=8)
    x = np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    want_c, want_v = _np_pca(x, 8)
    assert np.allclose(np.asarray(comps), want_c, atol=1e-8)
    assert np.allclose(np.asarray(var), want_v, atol=1e-8)
    # variance sorted descending — the determinism convention
    assert all(var[i] >= var[i + 1] for i in range(len(var) - 1))
    # components are unit-norm (eigh output), sign-fixed
    for c in comps:
        assert abs(np.linalg.norm(c) - 1.0) < 1e-9
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_pca_stable_across_partitionings(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1, v1 = embedding_pca(emb, "embedding", n_components=4)
    c2, v2 = embedding_pca(emb.repartition(13), "embedding", n_components=4)
    # float tree-reduction: equal within tolerance, not bit-exact (why this
    # operator is rows-only class, see docstring)
    assert np.allclose(c1, c2, atol=1e-8) and np.allclose(v1, v2, atol=1e-8)


def test_projection_is_exact_fold(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    comps, _ = embedding_pca(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        "embedding",
        n_components=4,
    )
    got = {
        r["vec_id"]: r["proj"]
        for r in project_embeddings(emb, "vec_id", "embedding", comps).collect()
    }
    for r in emb.collect():
        v = [float(x) for x in r["embedding"]]
        for j, comp in enumerate(comps):
            acc = 0.0  # same sequential left-fold as the JVM expression
            for x, y in zip(v, comp):
                acc += x * y
            assert got[r["vec_id"]][j] == pytest.approx(round(acc, 6), abs=1e-9)


def test_pca_recovers_planted_structure(spark):
    """The compression works where structure exists (the fixture
    embeddings are near-isotropic — top-16 of 64 dims explains only ~38%
    of variance, so neighbor tests there are meaningless): on a planted
    3-cluster corpus, the 2-component projection keeps every point
    closest to its own cluster's projected centroid."""
    rng = np.random.RandomState(0)
    centers = rng.normal(size=(3, 64)) * 5.0
    rows = []
    for i in range(240):
        c = i % 3
        rows.append((i, c, (centers[c] + rng.normal(size=64) * 0.3).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    comps, var = embedding_pca(df, "embedding", n_components=2)
    # planted structure dominates: 2 components carry most of the variance
    x = np.asarray([r[2] for r in rows])
    assert sum(var) / np.trace(np.cov(x.T)) > 0.8
    proj = {
        r["vec_id"]: np.asarray(r["proj"])
        for r in project_embeddings(df, "vec_id", "embedding", comps).collect()
    }
    pc = np.asarray(comps)
    proj_centers = {c: (centers[c] @ pc.T) for c in range(3)}
    hits = sum(
        min(proj_centers, key=lambda c: np.linalg.norm(proj[i] - proj_centers[c]))
        == (i % 3)
        for i in range(240)
    )
    assert hits == 240


def test_pca_validation(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="n_components"):
        embedding_pca(emb, "embedding", n_components=0)
    with pytest.raises(ValueError, match="exceeds dim"):
        embedding_pca(emb, "embedding", n_components=1000)
    one = emb.limit(1)
    with pytest.raises(ValueError, match=">= 2 vectors"):
        embedding_pca(one, "embedding", n_components=2)


def test_pca_null_and_empty_corpus_guards(spark):
    """r7 ADVICE: empty corpus and NULL vectors must fail (or filter)
    cleanly, not TypeError on first() or crash inside mapInPandas."""
    empty = spark.createDataFrame([], "id long, v array<double>")
    with pytest.raises(ValueError, match="no non-NULL vectors"):
        embedding_pca(empty, "v", n_components=1)
    all_null = spark.createDataFrame([(0, None), (1, None)], "id long, v array<double>")
    with pytest.raises(ValueError, match="no non-NULL vectors"):
        embedding_pca(all_null, "v", n_components=1)

    # NULL rows mixed into a valid corpus are excluded from the fit:
    # result identical to the same corpus without the NULL rows
    base = [(i, [float(i), float(i % 3), 1.0 - i * 0.1]) for i in range(12)]
    clean = spark.createDataFrame(base, "id long, v array<double>")
    dirty = clean.unionByName(
        spark.createDataFrame([(100, None), (101, None)], "id long, v array<double>")
    )
    comps_a, var_a = embedding_pca(clean.coalesce(1), "v", n_components=2)
    comps_b, var_b = embedding_pca(dirty.coalesce(1), "v", n_components=2)
    assert comps_a == comps_b and var_a == var_b


def test_pca_ivf_compressed_serving_path(spark, tmp_path):
    """Composition the compression exists for: train PCA, project, train
    k-means ON THE PROJECTION, publish the IVF lake layout keyed by
    projected lists, serve probes through partition pruning in the
    LOW-dim space, exact-rescore in FULL dim. The sound claim at this
    stage is CLUSTER-level recall (PCA keeps inter-cluster structure and
    deliberately discards the intra-cluster noise dims that near-tie
    rankings ride on): every probe gets a full shortlist, the rescored
    top-1 lands in the probe's planted cluster, and so does full-dim
    brute force — the coarse stage never routes a probe to the wrong
    cluster."""
    from chess_lakehouse_spark.operators.similarity import (
        kmeans_fit,
        knn_brute_force,
        publish_ivf_index,
        search_ivf_index,
    )

    rng = np.random.RandomState(1)
    centers = rng.normal(size=(4, 64)) * 5.0
    rows = [
        (i, (centers[i % 4] + rng.normal(size=64) * 0.2).tolist())
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    comps, _ = embedding_pca(df, "embedding", n_components=8)
    proj = project_embeddings(df, "vec_id", "embedding", comps).withColumnRenamed(
        "proj", "embedding"
    )
    cents = kmeans_fit(proj, "vec_id", "embedding", k=4, iters=3)
    idx = str(tmp_path / "ivf_proj")
    publish_ivf_index(proj, idx, "vec_id", "embedding", cents)

    probes_proj = proj.where(F.col("vec_id") < 8)
    shortlist = search_ivf_index(
        spark, idx, probes_proj, "vec_id", "embedding", cents, nprobe=1, k=10
    ).collect()
    per_q = {}
    for r in shortlist:
        per_q.setdefault(r["query_id"], []).append(r["cand_id"])
    assert set(per_q) == set(range(8))
    assert all(len(c) == 10 for c in per_q.values())

    # full-dim exact rescore of the low-dim shortlist
    full = {r[0]: r[1] for r in rows}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (
            sum(x * x for x in a) ** 0.5 * sum(y * y for y in b) ** 0.5
        )

    for q, cands in per_q.items():
        top = max(cands, key=lambda c: (cos(full[q], full[c]), -c))
        assert top % 4 == q % 4  # rescored top-1 is in the probe's cluster

    want = {
        r["query_id"]: r["cand_id"]
        for r in knn_brute_force(
            df, df.where(F.col("vec_id") < 8), "vec_id", "embedding", k=1
        ).collect()
    }
    assert all(want[q] % 4 == q % 4 for q in want)  # ground truth agrees
