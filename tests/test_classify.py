"""Learned quality classifier (operators/classify.py): planted-rule
recovery, exact agreement between the pure-column serving expression and
MLlib's own transform, JSON round-trip of the model dict, and the gate
form."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.classify import (
    QUALITY_FEATURES,
    classifier_score,
    quality_features,
    score_quality_classifier,
    train_quality_classifier,
)

GOOD_WORDS = "the cat sat on of and mat with dog house tree river stone".split()


def _corpus(n=200, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:  # clean prose: stopwords present, no symbol noise
            words = [rng.choice(GOOD_WORDS) for _ in range(rng.randint(30, 60))]
            rows.append((i, " ".join(words), 1))
        else:  # symbol-heavy junk: hashes and ellipses, no stopwords
            words = [
                rng.choice(["####", "...", "zzz#", "@@", "…", "qq##"])
                for _ in range(rng.randint(10, 40))
            ]
            rows.append((i, " ".join(words), 0))
    return rows


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(_corpus(), "doc_id long, text string, label int")


@pytest.fixture(scope="module")
def model(labeled):
    train = labeled.where("doc_id % 4 != 1")
    return train_quality_classifier(train, "doc_id", "text", "label")


def test_model_is_plain_json(model):
    round_tripped = json.loads(json.dumps(model))
    assert round_tripped == model
    assert model["features"] == list(QUALITY_FEATURES)
    assert set(model["coef"]) == set(QUALITY_FEATURES)


def test_planted_rule_recovery_on_held_out(labeled, model):
    """Held-out accuracy on the clean-vs-junk plant must be near-perfect —
    the separation is linear in the shared Gopher metrics."""
    held = labeled.where("doc_id % 4 = 1")
    scored = held.select(
        "label", classifier_score(F.col("text"), model).alias("p")
    )
    correct = scored.where(
        ((F.col("p") >= 0.5) & (F.col("label") == 1))
        | ((F.col("p") < 0.5) & (F.col("label") == 0))
    ).count()
    total = held.count()
    assert total > 0
    assert correct / total >= 0.95


def test_column_serving_matches_mllib_transform(spark, labeled, model):
    """The folded sigmoid expression must reproduce MLlib's own
    probability for every row — serving carries no model object, so this
    pins that nothing was lost in the fold."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    train = labeled.where("doc_id % 4 != 1")
    feats = quality_features(train, "doc_id", "text").join(
        train.select("doc_id", F.col("label").cast("double").alias("_label")),
        "doc_id",
    )
    assembled = VectorAssembler(
        inputCols=list(QUALITY_FEATURES), outputCol="_fv"
    ).transform(feats)
    lr_model = LogisticRegression(
        featuresCol="_fv", labelCol="_label", maxIter=100, regParam=0.01
    ).fit(assembled)

    mllib_p = {
        r["doc_id"]: float(r["probability"][1])
        for r in lr_model.transform(assembled).select("doc_id", "probability").collect()
    }
    col_p = {
        r["doc_id"]: r["p"]
        for r in train.select(
            "doc_id", classifier_score(F.col("text"), model).alias("p")
        ).collect()
    }
    assert set(mllib_p) == set(col_p)
    for k in mllib_p:
        assert col_p[k] == pytest.approx(mllib_p[k], abs=1e-9)


def test_gate_form_filters(labeled, model):
    kept = score_quality_classifier(labeled, "doc_id", "text", model, threshold=0.5)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    labels = {r["doc_id"]: r["label"] for r in labeled.collect()}
    wrong = sum(1 for i, lab in labels.items() if (i in ids) != (lab == 1))
    assert wrong / len(labels) <= 0.05
    assert kept.columns == labeled.columns  # gate preserves the row shape


def test_serving_plan_has_no_python(spark, labeled, model):
    """The serving path must stay JVM-side: no BatchEvalPython / no UDF
    in the physical plan."""
    out = labeled.select(classifier_score(F.col("text"), model).alias("p"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_cli_model_gate(spark, tmp_path, capsys, labeled, model):
    """clean-corpus --gate model --modelJson filters with the staged
    learned model: junk docs are gated out of the published corpus."""
    import json as _json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    model_path = tmp_path / "model.json"
    model_path.write_text(_json.dumps(model))

    src = tmp_path / "in"
    src.mkdir()
    lines = [
        _json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "s0"})
        for i, t, _ in _corpus(60, seed=11)
    ]
    (src / "p.jsonl").write_text("\n".join(lines) + "\n")
    out = tmp_path / "out"
    pipeline_cli.main([
        "clean-corpus", "--inDir", str(src), "--outDir", str(out),
        "--gate", "model", "--modelJson", str(model_path),
        "--threshold", "0.95", "--evalFrac", "0.0",
    ])
    published = {r.doc_id for r in spark.read.json(str(out / "corpus")).collect()}
    want = {i for i, _, lab in _corpus(60, seed=11) if lab == 1}
    # near-perfect separation on the plant (allow the odd boundary doc)
    sym_diff = published ^ want
    assert len(sym_diff) <= 3
    assert len(published) > 0


def test_streaming_model_gate_matches_batch(spark, tmp_path, labeled, model):
    """gate='model' on the stream keeps exactly the batch classifier-gate
    set — the folded sigmoid is stateless, so stream == batch."""
    import glob
    import json as _json
    import shutil

    from chess_lakehouse_spark.streaming import (
        corpus_ingest_clean,
        read_documents_stream,
        stream_corpus_to_jsonl_shards,
    )

    docs = labeled.select("doc_id", "text", F.lit("en").alias("lang"),
                          F.lit("s0").alias("source"))
    d = tmp_path / "docs_stream"
    staging = tmp_path / "_stage"
    docs.coalesce(1).write.parquet(str(staging))
    d.mkdir()
    shutil.copy(glob.glob(f"{staging}/part-*.parquet")[0], d / "p.parquet")

    out = str(tmp_path / "shards")
    clean = corpus_ingest_clean(
        read_documents_stream(spark, str(d)), min_quality=0.0,
        gate="model", model=model, model_threshold=0.5,
    )
    stream_corpus_to_jsonl_shards(clean, out, str(tmp_path / "ckpt"))
    got = set()
    for path in glob.glob(f"{out}/batch_id=*/*.json"):
        with open(path) as fh:
            got |= {_json.loads(line)["doc_id"] for line in fh}

    want = {
        r["doc_id"]
        for r in score_quality_classifier(
            docs, "doc_id", "text", model, threshold=0.5
        ).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_model_gate_requires_model(spark):
    import pytest as _pytest

    from chess_lakehouse_spark.streaming import corpus_ingest_clean

    with _pytest.raises(ValueError, match="requires a model dict"):
        corpus_ingest_clean(
            spark.range(1).selectExpr("id doc_id", "'x' text"),
            min_quality=0.0, gate="model",
        )


def test_cli_train_then_gate_end_to_end(spark, tmp_path, capsys):
    """The full CLI loop: train-quality-model on labeled JSONL -> staged
    model.json -> clean-corpus --gate model filters a fresh corpus."""
    import json as _json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    train_src = tmp_path / "train"
    train_src.mkdir()
    lines = [
        _json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "s0",
                     "label": lab})
        for i, t, lab in _corpus(120, seed=5)
    ]
    (train_src / "p.jsonl").write_text("\n".join(lines) + "\n")
    model_path = tmp_path / "model.json"
    pipeline_cli.main([
        "train-quality-model", "--inDir", str(train_src),
        "--outJson", str(model_path),
    ])
    assert "[train-quality-model]" in capsys.readouterr().out
    model = _json.loads(model_path.read_text())
    assert set(model) == {"features", "coef", "intercept"}

    score_src = tmp_path / "score"
    score_src.mkdir()
    fresh = _corpus(40, seed=13)
    (score_src / "p.jsonl").write_text("\n".join(
        _json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "s0"})
        for i, t, _ in fresh
    ) + "\n")
    out = tmp_path / "out"
    pipeline_cli.main([
        "clean-corpus", "--inDir", str(score_src), "--outDir", str(out),
        "--gate", "model", "--modelJson", str(model_path),
        "--threshold", "0.95", "--evalFrac", "0.0",
    ])
    published = {r.doc_id for r in spark.read.json(str(out / "corpus")).collect()}
    want = {i for i, _, lab in fresh if lab == 1}
    assert len(published ^ want) <= 2 and len(published) > 0
