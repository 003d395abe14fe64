"""Corpus-wide paragraph dedup (C4/RefinedWeb-style first-occurrence pass)
and the deterministic shuffle-shard layout — pinned against pure-Python
references and the SUITE oracle templates (imported from suite/llm.py, the
same anti-divergence pattern as tests/test_bm25.py: the driver-gated
oracle and this parity pin are one string)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.dedup import paragraph_dedup
from chess_lakehouse_spark.operators.sampling import (
    shard_assignments,
    write_shuffled_shards,
)

DOCS = [
    (0, "SITE HEADER\nalpha beta gamma\nSITE FOOTER"),
    (1, "SITE HEADER\ndelta epsilon\nSITE FOOTER"),
    (2, "unique paragraph here\n\nanother unique one"),
    (3, "SITE HEADER\nSITE FOOTER"),          # fully boilerplate
    (4, "alpha beta gamma\nfresh content"),   # body dup of doc 0's middle
]


def _py_paragraph_dedup(docs, sep="\n", min_chars=1):
    first = {}
    for i, text in docs:
        for pos, para in enumerate(text.split(sep)):
            if len(para.strip()) >= min_chars and para not in first:
                first[para] = (i, pos)
    out = {}
    for i, text in docs:
        kept, removed, paras = [], 0, text.split(sep)
        for pos, para in enumerate(paras):
            if len(para.strip()) < min_chars or first.get(para) == (i, pos):
                kept.append(para)
            else:
                removed += 1
        out[i] = (sep.join(kept), len(paras), removed)
    return out


def test_paragraph_dedup_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_removed"])
        for r in paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert got == _py_paragraph_dedup(DOCS)
    # the blank structural line in doc 2 survived
    assert "\n\n" in got[2][0]
    # fully-boilerplate doc 3 is still present, stripped to nothing
    assert got[3] == ("", 2, 2)


def test_paragraph_dedup_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, paragraph_dedup(df, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, paragraph_dedup(df.repartition(7), "doc_id", "text").collect())
    )
    assert a == b


def test_paragraph_dedup_duckdb_oracle_parity(spark):
    """The SUITE paragraph_dedup oracle (window-rank first occurrence,
    imported — not re-stated — from suite/llm.py) against the engine on
    the real fixture corpus at sf0.001, one scale below the driver's
    gate, split on the suite's PARA_SEP so multi-paragraph splits and
    cross-document repeats actually occur."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import PARA_SEP, _paragraph_dedup_oracle

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_removed"])
        for r in paragraph_dedup(docs, "doc_id", "text", sep=PARA_SEP).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    duck = {
        i: (c, np, nr)
        for i, c, np, nr in con.execute(_paragraph_dedup_oracle(PARA_SEP)).fetchall()
    }
    assert duck == got
    assert any(v[2] > 0 for v in got.values())  # dedup actually fired


def test_shard_assignments_duckdb_oracle_parity(spark):
    """The SUITE shard_assignments oracle (imported from suite/llm.py)
    against the engine on the fixture corpus at sf0.001 with the suite's
    exact (SHARD_N, SHARD_SEED) layout."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import SHARD_N, SHARD_SEED, _shard_oracle

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id"
    )
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assignments(docs, "doc_id", SHARD_N, seed=SHARD_SEED).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    duck = {
        i: (s, p)
        for i, s, p in con.execute(_shard_oracle(SHARD_N, SHARD_SEED)).fetchall()
    }
    assert duck == got
    assert len({s for s, _ in got.values()}) == SHARD_N  # every shard populated


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_shard_assignments_match_python_reference(spark):
    n, shards, seed = 500, 8, 3
    df = spark.range(0, n).select(F.col("id").alias("doc_id"))
    rows = shard_assignments(df, "doc_id", shards, seed=seed).collect()
    assert len(rows) == n

    want = {}
    per_shard = {}
    for i in range(n):
        h = _py_hash60(f"{seed}|shuffle|{i}")
        per_shard.setdefault(h % shards, []).append((h, i))
    for s, members in per_shard.items():
        for pos, (_, i) in enumerate(sorted(members), start=1):
            want[i] = (s, pos)
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}
    assert got == want
    # roughly uniform shards on 500 ids
    sizes = [len(m) for m in per_shard.values()]
    assert min(sizes) > 0.5 * n / shards and max(sizes) < 2.0 * n / shards


def test_shard_assignments_deterministic_and_seeded(spark):
    df = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, shard_assignments(df, "doc_id", 4).collect()))
    b = sorted(
        map(tuple, shard_assignments(df.repartition(11), "doc_id", 4).collect())
    )
    assert a == b
    c = sorted(map(tuple, shard_assignments(df, "doc_id", 4, seed=1).collect()))
    assert a != c  # a re-shuffle is just a new seed
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignments(df, "doc_id", 0)


def test_shard_order_is_a_shuffle_not_input_order(spark):
    df = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    rows = shard_assignments(df, "doc_id", 2).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["doc_id"]))
    for members in by_shard.values():
        ids_in_pos_order = [i for _, i in sorted(members)]
        assert ids_in_pos_order != sorted(ids_in_pos_order)


def test_write_shuffled_shards_layout(spark, tmp_path):
    import os

    out = str(tmp_path / "shards")
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("payload")
    )
    write_shuffled_shards(df, out, "doc_id", n_shards=4)
    dirs = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert dirs == {f"shard={k}" for k in range(4)}
    back = spark.read.parquet(out)
    assert back.count() == 200
    # pos is a 1..n permutation inside every shard
    stats = back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.count_distinct("pos").alias("d"),
    )
    for r in stats.collect():
        assert (r["lo"], r["hi"], r["d"]) == (1, r["n"], r["n"])
    # identical to the pure assignment path
    want = {
        (r["doc_id"], r["shard"], r["pos"], r["payload"])
        for r in shard_assignments(df, "doc_id", 4).collect()
    }
    got = {
        (r["doc_id"], int(r["shard"]), r["pos"], r["payload"])
        for r in back.collect()
    }
    assert got == want


def test_paragraph_dedup_null_text_survives(spark):
    """NULL text must behave as '' (one structural empty paragraph), not
    silently drop the document — split(NULL) is NULL and posexplode(NULL)
    yields no rows without the coalesce."""
    df = spark.createDataFrame(
        [(0, "alpha\nbeta"), (1, None), (2, "alpha\ngamma")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_removed"])
        for r in paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[1] == ("", 1, 0)
    assert got[2] == ("gamma", 2, 1)  # 'alpha' deduped against doc 0


def test_paragraph_dedup_document_scope(spark):
    """scope='document' (RefinedWeb intra-document line pass): repeats
    WITHIN a doc collapse to their first occurrence; content shared
    ACROSS docs survives in every doc."""
    docs = [
        (0, "NAV\nbody zero\nNAV\nbody zero tail"),   # NAV repeated in-doc
        (1, "NAV\nbody one"),                         # NAV also here: kept (cross-doc)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_removed"])
        for r in paragraph_dedup(df, "doc_id", "text", scope="document").collect()
    }
    assert got[0] == ("NAV\nbody zero\nbody zero tail", 4, 1)
    assert got[1] == ("NAV\nbody one", 2, 0)  # untouched: no intra-doc repeat
    with pytest.raises(ValueError, match="scope"):
        paragraph_dedup(df, "doc_id", "text", scope="global")


def test_paragraph_dedup_document_scope_oracle_parity(spark):
    """Document-scope oracle (same template, id-qualified partition key)
    vs the engine on the fixture corpus."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import PARA_SEP, _paragraph_dedup_oracle

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_removed"])
        for r in paragraph_dedup(
            docs, "doc_id", "text", sep=PARA_SEP, scope="document"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    duck = {
        i: (c, np, nr)
        for i, c, np, nr in con.execute(
            _paragraph_dedup_oracle(PARA_SEP, scope="document")
        ).fetchall()
    }
    assert duck == got
    # document scope removes strictly less than corpus scope (the fixture
    # corpus has cross-document repeats but no intra-document ones, so the
    # document pass is a no-op here — the removal behavior itself is
    # pinned by the planted-case unit test above)
    corpus_removed = sum(
        r["n_removed"]
        for r in paragraph_dedup(docs, "doc_id", "text", sep=PARA_SEP).collect()
    )
    doc_removed = sum(v[2] for v in got.values())
    assert doc_removed < corpus_removed
