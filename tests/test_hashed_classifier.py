"""fastText-class hashed-ngram linear classifier
(operators/classify.py: hashed_* / train_hashed_classifier) and the r10
staging candidate q_classifier_hashed against its suite-defined oracle
(HASHED_CLASSIFIER_ORACLE — weight table rebuilt in-engine from the same
literal tokens through the same md5 bucket chain)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.classify import (
    hashed_bucket,
    hashed_classifier_margins,
    hashed_features,
    hashed_weights_from_tokens,
    load_hashed_classifier,
    save_hashed_classifier,
    score_hashed_classifier,
    train_hashed_classifier,
)
from chess_lakehouse_spark.suite.llm import (
    HASHED_CLASSIFIER_ORACLE,
    HASHED_MODEL_BUCKETS,
    HASHED_MODEL_INTERCEPT,
    HASHED_MODEL_TOKENS,
    q_classifier_hashed,
)

NB = 1 << 16


# ---------------------------------------------------------------------------
# unit semantics
# ---------------------------------------------------------------------------


def test_bucket_matches_duckdb(spark):
    """The portable md5 bucket contract, end to end on real tokens."""
    toks = ["fast", "spark", "the", "a", "Ünïcode", "x" * 50]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r["tok"]: r["b"]
        for r in df.select("tok", hashed_bucket(F.col("tok"), NB).alias("b")).collect()
    }
    con = duckdb.connect()
    for t in toks:
        want = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT) % ?", [t, NB]
        ).fetchone()[0]
        assert got[t] == want, t
    con.close()


def test_hashed_features_counts_and_length(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, ""), (3, None), (4, "  x \t y\n")],
        "id long, text string",
    )
    rows = hashed_features(df, "id", "text", NB).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    # doc 1: 4 tokens, buckets for {a:2, b:1, c:1}
    assert {r["tf"] for r in by_id[1]} == {2, 1}
    assert all(r["n_d"] == 4 for r in by_id[1])
    assert sum(r["tf"] for r in by_id[1]) == 4
    # empty / NULL docs produce NO feature rows
    assert 2 not in by_id and 3 not in by_id
    # whitespace-class tokenization: 2 tokens
    assert all(r["n_d"] == 2 for r in by_id[4])


def test_margins_restore_zero_token_docs(spark):
    """Serving must return EVERY input row: zero-token and no-hit docs
    come back at margin == intercept."""
    df = spark.createDataFrame(
        [(1, "fast fast"), (2, ""), (3, None), (4, "nohit tokens only")],
        "id long, text string",
    )
    w = hashed_weights_from_tokens(spark, {"fast": 1.0}, NB)
    out = {r["id"]: r for r in hashed_classifier_margins(df, "id", "text", w, -0.25, NB).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["margin"] == pytest.approx(-0.25 + 1.0, abs=1e-9)
    for i in (2, 3, 4):
        assert out[i]["margin"] == pytest.approx(-0.25, abs=1e-12)
        assert out[i]["keep"] is False
    assert out[1]["keep"] is True


def test_weight_collisions_sum_exactly(spark):
    """Two tokens forced into one bucket (n_buckets=1) sum their weights
    through the DECIMAL(9,4) fold."""
    w = hashed_weights_from_tokens(spark, {"a": 0.1, "b": 0.2, "c": -0.05}, 1)
    rows = w.collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0
    assert rows[0]["w"] == pytest.approx(0.25, abs=1e-12)


def test_threshold_margin_gate_is_exact(spark):
    """score_hashed_classifier folds the threshold into the DECIMAL
    intercept, so keep is an exact comparison; the reported margin is
    the unshifted one."""
    df = spark.createDataFrame([(1, "fast"), (2, "slow")], "id long, text string")
    w = hashed_weights_from_tokens(spark, {"fast": 1.0, "slow": 0.4}, NB)
    meta = {"n_buckets": NB, "intercept": 0.0}
    out = {r["id"]: r for r in score_hashed_classifier(df, "id", "text", w, meta, threshold_margin=0.5).collect()}
    assert out[1]["keep"] is True and out[1]["margin"] == pytest.approx(1.0)
    assert out[2]["keep"] is False and out[2]["margin"] == pytest.approx(0.4)
    gated = score_hashed_classifier(df, "id", "text", w, meta, threshold_margin=0.5, gate=True)
    assert [r["id"] for r in gated.collect()] == [1]


# ---------------------------------------------------------------------------
# distributed GD training
# ---------------------------------------------------------------------------


def _planted_corpus(spark, n=400, seed_tok="zzspamzz"):
    """Half the docs carry a planted spam token; labels follow the rule
    label = 0 iff the token is present (the classifier must recover it)."""
    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta"
    for i in range(n):
        spam = i % 2 == 0
        text = f"{base} {seed_tok}" if spam else base + " iota kappa"
        rows.append((i, text, 0 if spam else 1))
    return spark.createDataFrame(rows, "id long, text string, label int")


def test_gd_recovers_planted_rule(spark):
    df = _planted_corpus(spark)
    train = df.where("id % 4 <> 3")
    held = df.where("id % 4 = 3")
    w, meta = train_hashed_classifier(
        train, "id", "text", "label", n_buckets=NB, lr=6.0, iters=40
    )
    scored = score_hashed_classifier(held, "id", "text", w, meta)
    joined = scored.join(held.select("id", "label"), "id")
    acc = joined.where(
        (F.col("keep") & (F.col("label") == 1))
        | (~F.col("keep") & (F.col("label") == 0))
    ).count() / held.count()
    assert acc >= 0.95, f"held-out accuracy {acc}"
    # the planted token's bucket must carry a strongly negative weight
    spam_bucket = (
        spark.createDataFrame([("zzspamzz",)], "tok string")
        .select(hashed_bucket(F.col("tok"), NB).alias("b"))
        .collect()[0]["b"]
    )
    spam_w = {r["bucket"]: r["w"] for r in w.collect()}[spam_bucket]
    assert spam_w < -0.5


def test_gd_weights_stay_distributed(spark):
    """The weight frame only materializes buckets the corpus touches —
    never a dense n_buckets vector — and training state on the driver is
    the intercept alone (meta)."""
    df = _planted_corpus(spark, n=60)
    w, meta = train_hashed_classifier(
        df, "id", "text", "label", n_buckets=1 << 20, lr=2.0, iters=3
    )
    n_seen_tokens = 11  # base 8 + spam + iota + kappa
    assert w.count() <= n_seen_tokens
    assert set(meta) >= {"n_buckets", "intercept"}


def test_train_empty_frame_raises(spark):
    df = spark.createDataFrame([], "id long, text string, label int")
    with pytest.raises(ValueError, match="empty"):
        train_hashed_classifier(df, "id", "text", "label", n_buckets=NB, iters=1)


def test_save_load_roundtrip(spark, tmp_path):
    df = _planted_corpus(spark, n=60)
    w, meta = train_hashed_classifier(
        df, "id", "text", "label", n_buckets=NB, lr=2.0, iters=3
    )
    path = str(tmp_path / "model")
    save_hashed_classifier(w, meta, path)
    w2, meta2 = load_hashed_classifier(spark, path)
    assert meta2["n_buckets"] == meta["n_buckets"]
    assert meta2["intercept"] == pytest.approx(meta["intercept"], abs=0)
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, w2.collect()))
    # scoring through the loaded model is identical
    a = sorted(map(tuple, score_hashed_classifier(df, "id", "text", w, meta).collect()))
    b = sorted(map(tuple, score_hashed_classifier(df, "id", "text", w2, meta2).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# r10 staging candidate: q_classifier_hashed vs suite oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_classifier_hashed_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof: exact values, driver-safe types, both
    local scales."""
    sdf = q_classifier_hashed(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == ["bigint", "double", "boolean"]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    rel = con.sql(HASHED_CLASSIFIER_ORACLE)
    assert all(str(t) in {"BIGINT", "DOUBLE", "BOOLEAN"} for t in rel.types)
    drows = sorted(tuple(r) for r in con.execute(HASHED_CLASSIFIER_ORACLE).fetchall())
    con.close()
    assert len(srows) > 0
    assert srows == drows


def test_q_classifier_hashed_discriminates(spark):
    """The fixed model must split the fixture on both sides, and keep
    must equal margin >= 0."""
    rows = q_classifier_hashed(spark, "/root/testdata/sf0.001").collect()
    kept = [r for r in rows if r["keep"]]
    assert 0 < len(kept) < len(rows)
    for r in rows:
        assert r["keep"] == (r["margin"] >= 0.0)


def test_q_classifier_hashed_plan_is_jvm_side(spark):
    """Serving must stay whole-stage-codegen: no Python eval, no MLlib."""
    plan = (
        q_classifier_hashed(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# pipeline integration: CLI train->gate loop and streaming parity
# ---------------------------------------------------------------------------


def _labeled_jsonl(tmp_path, name, n=120, labeled=True, seed=3):
    import json as _json
    import random

    rng = random.Random(seed)
    d = tmp_path / name
    d.mkdir()
    rows = []
    for i in range(n):
        junk = i % 2 == 1
        words = (
            [rng.choice(["buy", "click", "free", "deal", "now"]) for _ in range(20)]
            if junk
            else [rng.choice(["river", "stone", "tree", "house", "cloud"]) for _ in range(20)]
        )
        rec = {"doc_id": i, "text": " ".join(words), "lang": "en", "source": "s0"}
        if labeled:
            rec["label"] = 0 if junk else 1
        rows.append(_json.dumps(rec))
    (d / "p.jsonl").write_text("\n".join(rows) + "\n")
    return d, {i for i in range(n) if i % 2 == 0}


def test_cli_train_hashed_then_gate_end_to_end(spark, tmp_path, capsys):
    """train-hashed-model on labeled JSONL -> staged parquet model ->
    clean-corpus --gate hashed filters a fresh corpus with the same
    vocabulary split."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    train_src, _ = _labeled_jsonl(tmp_path, "train", n=120, seed=3)
    model_dir = tmp_path / "hashed_model"
    pipeline_cli.main([
        "train-hashed-model", "--inDir", str(train_src),
        "--outDir", str(model_dir), "--nBuckets", str(NB),
        "--lr", "6.0", "--iters", "30",
    ])
    assert "[train-hashed-model]" in capsys.readouterr().out

    score_src, want_clean = _labeled_jsonl(
        tmp_path, "score", n=40, labeled=False, seed=11
    )
    out = tmp_path / "out"
    pipeline_cli.main([
        "clean-corpus", "--inDir", str(score_src), "--outDir", str(out),
        "--gate", "hashed", "--hashedModelDir", str(model_dir),
        "--threshold", "0.95", "--evalFrac", "0.0",
    ])
    published = {r.doc_id for r in spark.read.json(str(out / "corpus")).collect()}
    assert published == want_clean


def test_cli_gate_hashed_requires_model_dir(tmp_path):
    import sys
    from pathlib import Path

    import pytest as _pytest

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    src, _ = _labeled_jsonl(tmp_path, "src", n=4, labeled=False)
    with _pytest.raises(SystemExit, match="hashedModelDir"):
        pipeline_cli.main([
            "clean-corpus", "--inDir", str(src),
            "--outDir", str(tmp_path / "out"), "--gate", "hashed",
        ])


def test_streaming_hashed_gate_matches_batch(spark, tmp_path):
    """The staged hashed gate wired into the streaming shard sink admits
    exactly the batch gate's set — the margin is a pure function of row
    text + static weights, so micro-batch boundaries cannot change it."""
    import glob
    import json as _json

    from chess_lakehouse_spark.streaming import (
        corpus_ingest_clean,
        read_documents_stream,
        stream_corpus_to_jsonl_shards,
    )

    # texts unique per doc (the ingest stage exact-dedups on content_md5
    # upstream of the gate — identical texts would collapse before it)
    rows = [
        (i,
         f"buy click free deal now n{i}" if i % 3 == 0
         else f"river stone tree house n{i}",
         "en", "s0")
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    d = tmp_path / "docs_stream"
    docs.coalesce(1).write.parquet(str(d))

    w = hashed_weights_from_tokens(spark, {"buy": -2.0, "click": -2.0, "river": 1.0}, NB)
    meta = {"n_buckets": NB, "intercept": 0.1}
    model_dir = str(tmp_path / "model")
    save_hashed_classifier(w, meta, model_dir)

    out = str(tmp_path / "shards")
    clean = corpus_ingest_clean(read_documents_stream(spark, str(d)), min_quality=0.0)
    stream_corpus_to_jsonl_shards(
        clean, out, str(tmp_path / "ckpt"), hashed_model_dir=model_dir
    )
    got = set()
    for path in glob.glob(f"{out}/batch_id=*/*.json"):
        with open(path) as fh:
            got |= {_json.loads(line)["doc_id"] for line in fh}
    want = {
        r["doc_id"]
        for r in score_hashed_classifier(docs, "doc_id", "text", w, meta, gate=True).collect()
    }
    assert got == want
    assert 0 < len(want) < 30


def test_model_constants_are_in_sync():
    """The oracle is generated from the same constants the query folds —
    a drifted literal regenerates a different SQL string."""
    from chess_lakehouse_spark.suite.llm import hashed_classifier_oracle_sql

    assert hashed_classifier_oracle_sql() == HASHED_CLASSIFIER_ORACLE
    assert repr(HASHED_MODEL_INTERCEPT) in HASHED_CLASSIFIER_ORACLE
    for tok in HASHED_MODEL_TOKENS:
        assert f"'{tok}'" in HASHED_CLASSIFIER_ORACLE
    assert str(HASHED_MODEL_BUCKETS) in HASHED_CLASSIFIER_ORACLE
