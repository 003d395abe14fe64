"""Portable Bloom-filter gate (operators/bloom.py): no false negatives,
bounded false positives, partition-invariance, a pure-Python bit-math
reference, and the r11 staging candidate's two-scale oracle parity
(suite/llm.py:q_bloom_gate / BLOOM_GATE_ORACLE)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.bloom import (
    WORD_BITS,
    bloom_might_contain,
    build_bloom,
)
from chess_lakehouse_spark.suite.llm import (
    BLOOM_GATE_ORACLE,
    q_bloom_gate,
)


def _py_positions(key: str, m_bits: int, k: int) -> list[int]:
    return [
        int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:15], 16) % m_bits
        for i in range(k)
    ]


def _py_might(key: str, members: set[str], m_bits: int, k: int) -> bool:
    bits = set()
    for mkey in members:
        bits.update(_py_positions(mkey, m_bits, k))
    return all(p in bits for p in _py_positions(key, m_bits, k))


def test_bloom_no_false_negatives_and_python_reference(spark):
    members = [f"member-{i}" for i in range(200)]
    probes = [f"probe-{i}" for i in range(500)]
    m_bits, k = 63 * 40, 4
    mdf = spark.createDataFrame([(m,) for m in members], "key string")
    bloom = build_bloom(mdf, "key", m_bits=m_bits, k=k)
    pdf = spark.createDataFrame(
        [(p,) for p in members + probes], "key string"
    ).repartition(9)
    got = {
        r.key: r.might_contain
        for r in bloom_might_contain(pdf, "key", bloom).collect()
    }
    # no false negatives, ever
    assert all(got[m] for m in members)
    # every verdict — including each false positive — matches the
    # pure-Python bit-math reference exactly
    mset = set(members)
    for p in members + probes:
        assert got[p] == _py_might(p, mset, m_bits, k), p
    # the filter discriminates: most probes are rejected
    fps = sum(1 for p in probes if got[p])
    assert fps < len(probes) * 0.2


def test_bloom_partition_invariance_and_nulls(spark):
    members = [f"m{i}" for i in range(50)]
    m1 = spark.createDataFrame([(m,) for m in members], "key string").coalesce(1)
    m2 = spark.createDataFrame(
        [(m,) for m in reversed(members)], "key string"
    ).repartition(13)
    b1 = build_bloom(m1, "key", m_bits=63 * 8, k=3).first()
    b2 = build_bloom(m2, "key", m_bits=63 * 8, k=3).first()
    assert list(b1["words"]) == list(b2["words"])  # order/partition invariant
    assert b1["n_keys"] == b2["n_keys"] == 50

    probe = spark.createDataFrame([("m1",), (None,)], "key string")
    bloom = build_bloom(m1, "key", m_bits=63 * 8, k=3)
    got = {
        r.key: r.might_contain
        for r in bloom_might_contain(probe, "key", bloom).collect()
    }
    assert got["m1"] is True and got[None] is False


def test_bloom_empty_blocklist_and_validation(spark):
    empty = spark.createDataFrame([], "key string")
    bloom = build_bloom(empty, "key", m_bits=63 * 4, k=2)
    row = bloom.first()
    assert row["n_keys"] == 0 and all(w == 0 for w in row["words"])
    probe = spark.createDataFrame([("x",)], "key string")
    assert not bloom_might_contain(probe, "key", bloom).first()["might_contain"]

    with pytest.raises(ValueError, match="m_bits"):
        build_bloom(empty, "key", m_bits=10)
    with pytest.raises(ValueError, match="k must"):
        build_bloom(empty, "key", k=0)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_bloom_gate_candidate_matches_oracle_two_scales(spark, sf_dir):
    sdf = q_bloom_gate(spark, sf_dir)
    assert dict(sdf.dtypes) == {"doc_id": "bigint", "might_contain": "boolean"}
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    drows = sorted(tuple(r) for r in con.execute(BLOOM_GATE_ORACLE).fetchall())
    con.close()
    assert len(srows) > 0
    assert srows == drows
    # the gate discriminates on this corpus: both verdicts present
    verdicts = {r[1] for r in srows}
    assert verdicts == {True, False}


def test_bloom_gate_candidate_plan_is_map_side(spark):
    plan = (
        q_bloom_gate(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan  # the bitmap rides in as a broadcast


def test_merge_and_append_bloom_equals_single_build(spark):
    """Bitwise-OR mergeability: per-batch filters folded with
    merge_blooms / append_bloom must be BIT-IDENTICAL to one filter
    built over the union of keys, mismatched dimensions must raise, and
    n_keys sums the folded instances."""
    from chess_lakehouse_spark.operators.bloom import append_bloom, merge_blooms

    a = [f"a{i}" for i in range(40)]
    b = [f"b{i}" for i in range(60)]
    m_bits, k = 63 * 8, 3
    df_a = spark.createDataFrame([(x,) for x in a], "key string")
    df_b = spark.createDataFrame([(x,) for x in b], "key string")
    df_ab = spark.createDataFrame([(x,) for x in a + b], "key string")

    ba = build_bloom(df_a, "key", m_bits=m_bits, k=k)
    bb = build_bloom(df_b, "key", m_bits=m_bits, k=k)
    want = build_bloom(df_ab, "key", m_bits=m_bits, k=k).first()

    merged = merge_blooms(ba, bb).first()
    assert list(merged["words"]) == list(want["words"])
    assert (merged["m_bits"], merged["k"]) == (m_bits, k)
    assert merged["n_keys"] == 100

    appended = append_bloom(df_b, "key", ba).first()
    assert list(appended["words"]) == list(want["words"])

    # appended filter gates exactly like the single build
    probe = spark.createDataFrame(
        [(x,) for x in a + b + ["nope1", "nope2"]], "key string"
    )
    got = {
        r.key: r.might_contain
        for r in bloom_might_contain(
            probe, "key", merge_blooms(ba, bb)
        ).collect()
    }
    ref = {
        r.key: r.might_contain
        for r in bloom_might_contain(
            probe, "key", build_bloom(df_ab, "key", m_bits=m_bits, k=k)
        ).collect()
    }
    assert got == ref
    assert all(got[x] for x in a + b)

    with pytest.raises(ValueError, match="mismatched"):
        merge_blooms(ba, build_bloom(df_b, "key", m_bits=63 * 4, k=k)).first()
    with pytest.raises(ValueError, match="at least one"):
        merge_blooms()


def test_bloom_table_layout_matches_array_form(spark):
    """The word-TABLE layout (for filters past the single-row cap) must
    produce IDENTICAL verdicts to the array form on every probe —
    members, misses, false positives, and NULL keys."""
    from chess_lakehouse_spark.operators.bloom import (
        bloom_might_contain_table,
        build_bloom_table,
    )

    members = [f"member-{i}" for i in range(150)]
    probes = [f"probe-{i}" for i in range(300)]
    m_bits, k = 63 * 24, 4
    mdf = spark.createDataFrame([(m,) for m in members], "key string")

    bloom = build_bloom(mdf, "key", m_bits=m_bits, k=k)
    words = build_bloom_table(mdf, "key", m_bits=m_bits, k=k)

    # the sparse table IS the array's non-zero words
    arr = bloom.first()["words"]
    table = {r.widx: r.word for r in words.collect()}
    assert table == {i: w for i, w in enumerate(arr) if w != 0}

    pdf = spark.createDataFrame(
        [(i, x) for i, x in enumerate(members + probes)] + [(9999, None)],
        "rid long, key string",
    ).repartition(7)
    got_arr = {
        r.rid: r.might_contain
        for r in bloom_might_contain(pdf, "key", bloom).collect()
    }
    got_tbl = {
        r.rid: r.might_contain
        for r in bloom_might_contain_table(
            pdf, "key", "rid", words, m_bits=m_bits, k=k
        ).collect()
    }
    assert got_tbl == got_arr
    assert got_tbl[9999] is False


def test_bloom_gate_reserved_column_clash_raises(spark):
    """bloom_might_contain must refuse inputs whose columns collide with
    its staging names (__bloom_words, __bp*) or the out_col, instead of
    silently overwriting them (the global_sort_rank convention)."""
    members = spark.createDataFrame([("m",)], "key string")
    bloom = build_bloom(members, "key", m_bits=63 * 4, k=2)

    clash_words = spark.createDataFrame(
        [("x", 1)], "key string, __bloom_words int"
    )
    with pytest.raises(ValueError, match="__bloom_words"):
        bloom_might_contain(clash_words, "key", bloom)

    clash_bp = spark.createDataFrame([("x", 1)], "key string, __bp1 int")
    with pytest.raises(ValueError, match="__bp1"):
        bloom_might_contain(clash_bp, "key", bloom)

    clash_out = spark.createDataFrame(
        [("x", True)], "key string, might_contain boolean"
    )
    with pytest.raises(ValueError, match="might_contain"):
        bloom_might_contain(clash_out, "key", bloom)
    # a custom out_col that clashes is equally refused; a free name passes
    with pytest.raises(ValueError, match="key"):
        bloom_might_contain(clash_out, "key", bloom, out_col="key")
    ok = bloom_might_contain(clash_out, "key", bloom, out_col="verdict")
    assert set(ok.columns) == {"key", "might_contain", "verdict"}


def test_bloom_table_layout_m_bits_ceiling(spark):
    """The word-TABLE entry points validate the INT32 word-index ceiling
    (63 * 2^31 bits) loudly instead of overflowing the widx cast."""
    from chess_lakehouse_spark.operators.bloom import (
        TABLE_MAX_BITS,
        bloom_might_contain_table,
        build_bloom_table,
    )

    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError, match="63\\*2\\^31"):
        build_bloom_table(df, "key", m_bits=TABLE_MAX_BITS + 1)
    with pytest.raises(ValueError, match="63\\*2\\^31"):
        bloom_might_contain_table(
            df.withColumn("rid", F.lit(1)),
            "key",
            "rid",
            spark.createDataFrame([], "widx int, word long"),
            m_bits=TABLE_MAX_BITS + 1,
        )
    assert TABLE_MAX_BITS == 63 * (1 << 31)


def test_write_bloom_batch_swap_publish(spark, tmp_path):
    """write_bloom_batch publishes via the rename-aside swap: the live
    batch partition round-trips, re-publish (crash replay) lands
    byte-identically, and no staging/aside leftovers survive the happy
    path — so a concurrent read_bloom_merged can never observe a
    half-written partition."""
    import os

    from chess_lakehouse_spark.operators.bloom import (
        read_bloom_merged,
        write_bloom_batch,
    )

    state = str(tmp_path / "bloom_state")
    keys = spark.createDataFrame([(f"k{i}",) for i in range(20)], "key string")
    bloom = build_bloom(keys, "key", m_bits=63 * 8, k=3)

    write_bloom_batch(bloom, state, 0)
    first = read_bloom_merged(spark, state).first()
    assert first["n_keys"] == 20

    # replay: same batch id republishes over the live partition
    write_bloom_batch(bloom, state, 0)
    replay = read_bloom_merged(spark, state).first()
    assert list(replay["words"]) == list(first["words"])
    assert replay["n_keys"] == 20

    entries = sorted(os.listdir(state))
    assert entries == ["batch_id=0"], entries  # no .staging / .old leftovers
