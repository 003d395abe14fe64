"""Domain-mixture weight fitting: planted-mixture recovery, simplex
invariants, determinism across partitionings, and the end-to-end
fit-then-mix composition. Driver-side convex solve over exact integer
bucket counts — no SQL oracle class (the solver is linear algebra), the
pins are recovery and invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.sampling import mixture_fit


def _corpus(spark, specs):
    """specs: [(source, vocab_prefix, n_docs)] — disjoint vocabularies so
    the mixture is identifiable."""
    rows = []
    i = 0
    for src, pref, n in specs:
        for _ in range(n):
            rows.append((i, " ".join(f"{pref}{j}" for j in range(20)), src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_mixture_fit_recovers_planted_weights(spark):
    raw = _corpus(spark, [("a", "alpha", 30), ("b", "beta", 30), ("c", "gamma", 30)])
    # target: 60% a-vocab, 30% b-vocab, 10% c-vocab (by token volume)
    target = _corpus(spark, [("t", "alpha", 12), ("t", "beta", 6), ("t", "gamma", 2)])
    got = dict(mixture_fit(raw, target, "source", "text", n_buckets=128))
    assert got["a"] == pytest.approx(0.6, abs=0.02)
    assert got["b"] == pytest.approx(0.3, abs=0.02)
    assert got["c"] == pytest.approx(0.1, abs=0.02)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)
    assert all(w >= 0 for w in got.values())


def test_mixture_fit_zeroes_unrepresented_source(spark):
    """A source whose vocabulary never appears in the target gets ~0."""
    raw = _corpus(spark, [("a", "alpha", 20), ("junk", "zzz", 20)])
    target = _corpus(spark, [("t", "alpha", 10)])
    got = dict(mixture_fit(raw, target, "source", "text", n_buckets=128))
    assert got["a"] == pytest.approx(1.0, abs=0.02)
    assert got["junk"] == pytest.approx(0.0, abs=0.02)


def test_mixture_fit_deterministic_across_partitionings(spark):
    raw = _corpus(spark, [("a", "alpha", 15), ("b", "beta", 15)])
    target = _corpus(spark, [("t", "alpha", 4), ("t", "beta", 8)])
    w1 = mixture_fit(raw, target, "source", "text", n_buckets=64)
    w2 = mixture_fit(raw.repartition(13), target.repartition(7), "source", "text", n_buckets=64)
    assert w1 == w2  # exact integer counts in, fixed solver -> identical out


def test_mixture_fit_validation(spark):
    raw = _corpus(spark, [("a", "alpha", 3)])
    empty_target = spark.createDataFrame([(0, "", "t")], "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="n_buckets"):
        mixture_fit(raw, raw, "source", "text", n_buckets=1)
    with pytest.raises(ValueError, match="target corpus has no tokens"):
        mixture_fit(raw, empty_target, "source", "text")


def test_mixture_keep_rates_math():
    """Weights are target PROPORTIONS, not rates: rate ∝ weight / size,
    scaled so the max rate is 1 (r7 ADVICE — equal-sized fixtures masked
    this in the CLI)."""
    from chess_lakehouse_spark.operators.sampling import mixture_keep_rates

    # a is 3x over-represented relative to its target share
    rates = mixture_keep_rates({"a": 0.5, "b": 0.5}, {"a": 300, "b": 100})
    assert rates["b"] == 1.0
    assert rates["a"] == pytest.approx(1 / 3)
    # kept mixture = rate*size, normalized -> matches the weights
    kept = {s: rates[s] * n for s, n in {"a": 300, "b": 100}.items()}
    tot = sum(kept.values())
    assert kept["a"] / tot == pytest.approx(0.5)
    # zero-weight source drops out entirely
    assert mixture_keep_rates({"a": 1.0, "z": 0.0}, {"a": 10, "z": 10})["z"] == 0.0
    with pytest.raises(ValueError, match="no size"):
        mixture_keep_rates({"a": 1.0}, {})
    with pytest.raises(ValueError, match="non-positive size"):
        mixture_keep_rates({"a": 1.0}, {"a": 0})
    with pytest.raises(ValueError, match="all weights are zero"):
        mixture_keep_rates({"a": 0.0}, {"a": 10})


def test_mixture_weights_drive_temperature_free_mix(spark):
    """Composition: fitted weights -> keep rates (via per-source sizes) ->
    stratified hash sample, with UNEQUAL source sizes — the kept corpus's
    source proportions must track the fitted TARGET proportions, which is
    exactly what using weights as raw rates gets wrong."""
    from chess_lakehouse_spark.operators.sampling import (
        mixture_keep_rates,
        stratified_hash_sample,
    )

    raw = _corpus(spark, [("a", "alpha", 600), ("b", "beta", 200)])
    target = _corpus(spark, [("t", "alpha", 6), ("t", "beta", 6)])
    w = dict(mixture_fit(raw, target, "source", "text", n_buckets=64))
    assert w["a"] == pytest.approx(0.5, abs=0.02)
    sizes = {
        r["source"]: r["n"]
        for r in raw.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rates = mixture_keep_rates(w, sizes)
    sampled = stratified_hash_sample(raw, "doc_id", "source", rates=rates, default_rate=0.0)
    got = {r["source"]: r["n"] for r in sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_a, n_b = got.get("a", 0), got.get("b", 0)
    assert n_a + n_b > 0
    # kept mixture ~ 50/50 even though raw is 75/25
    assert n_a / (n_a + n_b) == pytest.approx(w["a"], abs=0.08)
