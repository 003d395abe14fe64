"""Edit-distance near-dup join (operators/dedup.py:edit_distance_pairs —
Gravano et al. VLDB'01 positional q-gram count filter + threshold-DP
verify): brute-force completeness on real and synthetic corpora, both
candidate paths and their boundary, the stop-gram soundness adjustment,
plan shape, and the staged q_dedup_edit candidate's two-scale oracle
parity (byte-vs-char levenshtein pinned to ASCII scope)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.dedup import edit_distance_pairs


def _brute(df, max_dist):
    b = df.select(F.col("id"), F.col("text").alias("t")).where(
        F.col("t").isNotNull()
    )
    return sorted(
        tuple(r)
        for r in (
            b.alias("a")
            .join(b.alias("b"), F.col("a.id") < F.col("b.id"))
            .withColumn("dist", F.levenshtein("a.t", "b.t", max_dist))
            .where(F.col("dist") >= 0)
            .select("a.id", "b.id", F.col("dist").cast("long"))
            .collect()
        )
    )


def _run(df, max_dist, **kw):
    out = edit_distance_pairs(df, "id", "text", max_dist, **kw)
    return sorted(tuple(r) for r in out.collect())


def test_hand_distances_and_threshold_boundary(spark):
    """Known distances; dist == max_dist kept, max_dist + 1 dropped;
    identical strings score 0."""
    rows = [
        (1, "kitten"),
        (2, "sitting"),          # 3 edits from kitten
        (3, "kitten"),           # exact duplicate of 1
        (4, "kittenabc"),        # 3 inserts from kitten
        (5, "xyzzy plugh"),      # far from everything
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {(a, b): d for a, b, d in _run(df, 3)}
    assert got[(1, 2)] == 3 and got[(1, 3)] == 0 and got[(1, 4)] == 3
    assert (2, 4) not in got          # sitting->kittenabc is 6 > 3
    assert not any(5 in p for p in got)
    # boundary: same pair drops when the threshold tightens below 3
    got2 = {(a, b): d for a, b, d in _run(df, 2)}
    assert (1, 2) not in got2 and got2[(1, 3)] == 0


def test_brute_force_parity_real_fixture(spark):
    """Complete and exact on the sf0.001 documents corpus (all strings in
    the gram-path length class)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").alias("id"), "text")
    )
    assert _run(docs, 10) == _brute(docs, 10)


def test_brute_force_parity_short_and_boundary(spark):
    """Short-string bucket path (len < q*(d+1)), empty string, NULL text,
    and pairs STRADDLING the two-path length split (longer side just at /
    above q*(d+1) = 44 with the shorter below it)."""
    rows = [
        (1, "kitten"), (2, "sitting"), (3, ""), (4, "kittenx"),
        (5, "a" * 43), (6, "a" * 40 + "bbbbc"), (7, "a" * 50),
        (8, None), (9, "zz"), (10, "a" * 44),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = _run(df, 10)
    assert got == _brute(df, 10)
    pairs = {(a, b) for a, b, _ in got}
    assert (1, 3) in pairs            # empty vs 6-char: dist 6 via buckets
    assert (5, 10) in pairs           # 43 vs 44: straddles the class split
    assert not any(8 in p for p in pairs)


def test_stop_gram_cap_is_lossless(spark):
    """Dropping hot grams with the threshold weakened by
    least(dropped_a, dropped_b) keeps recall exact — same rows as the
    unfiltered plan on a corpus WITH a hot shared gram."""
    base = "the quick brown fox jumps over the lazy dog near the old barn "
    rows = [(i, base + f"variant {i % 7}") for i in range(40)] + [
        (100, base + "variant 0x"),  # distance 1 from the i%7==0 class
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    plain = _run(df, 4)
    capped = _run(df, 4, stop_gram_min_df=5)
    assert plain == capped and len(plain) > 0


def test_validation_and_determinism(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, text string")
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(df, "id", "text", 0)
    with pytest.raises(ValueError, match="q must"):
        edit_distance_pairs(df, "id", "text", 3, q=1)
    with pytest.raises(ValueError, match="stop_gram_min_df"):
        edit_distance_pairs(df, "id", "text", 3, stop_gram_min_df=0)
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").alias("id"), "text")
    )
    assert _run(docs, 10) == _run(docs, 10)


def test_no_cartesian_product(spark):
    """Every join in the plan is keyed: gram equi-join, bucket equi-join,
    id verify joins — never a cartesian expansion."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").alias("id"), "text")
    )
    plan = (
        edit_distance_pairs(docs, "id", "text", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_dedup_edit_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof: exact values, driver-safe types, both
    local scales, non-empty result."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import EDIT_DIST_ORACLE, q_dedup_edit

    sdf = q_dedup_edit(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == ["bigint", "bigint", "bigint"]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rel = con.sql(EDIT_DIST_ORACLE)
    assert all(str(t) == "BIGINT" for t in rel.types), [str(t) for t in rel.types]
    drows = sorted(tuple(r) for r in con.execute(EDIT_DIST_ORACLE).fetchall())
    con.close()
    assert len(srows) > 0
    assert srows == drows


def test_edit_distance_dedup_keeps_min_id_canonical(spark):
    """Pairs -> components -> min-id keep: transitive edit-chains collapse
    to one survivor; NULL-text and isolated rows always survive, all
    columns intact."""
    from chess_lakehouse_spark.operators.dedup import edit_distance_dedup

    rows = [
        (1, "kitten", "a"), (2, "sitten", "b"), (3, "sittin", "c"),  # chain
        (4, "completely different words", "d"),
        (5, None, "e"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, tag string")
    kept = edit_distance_dedup(df, "id", "text", max_dist=1)
    assert sorted(r.id for r in kept.collect()) == [1, 4, 5]
    assert kept.columns == ["id", "text", "tag"]


def test_pipeline_cli_edit_dedup_stage(spark, tmp_path, capsys):
    """The edit-dedup CLI reads any (id, text) parquet — custom column
    names included — and writes the survivors."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    src = tmp_path / "titles"
    spark.createDataFrame(
        [
            (10, "the yellow king", "x"),
            (11, "the yellow kings", "y"),
            (12, "an unrelated record", "z"),
        ],
        "rec_id long, title string, tag string",
    ).write.parquet(str(src))
    out = tmp_path / "kept"
    pipeline_cli.main([
        "edit-dedup", "--inParquet", str(src), "--outDir", str(out),
        "--idCol", "rec_id", "--textCol", "title", "--maxDist", "2",
    ])
    got = spark.read.parquet(str(out))
    assert sorted(r["rec_id"] for r in got.collect()) == [10, 12]
    assert got.columns == ["rec_id", "title", "tag"]
    assert "kept=2" in capsys.readouterr().out


def test_incremental_edit_dups_matches_brute_force(spark):
    """Asymmetric (batch vs staged corpus) form: exact parity with the
    brute cross-check, with and without the stop-gram knob — including a
    batch doc made ENTIRELY of corpus-hot grams (degenerate after the
    drop: caught only by the all-lengths bucket reroute) and short/
    boundary strings on both sides."""
    from chess_lakehouse_spark.operators.dedup import (
        edit_signatures,
        incremental_edit_dups,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    hotdoc = " ".join(["value table part"] * 6)
    new = docs.where(F.col("doc_id") % 2 == 1).unionByName(
        spark.createDataFrame(
            [(9001, hotdoc), (9002, None), (9004, "a" * 43), (9005, "a" * 50)],
            "doc_id long, text string",
        )
    )
    corpus = docs.where(F.col("doc_id") % 2 == 0).unionByName(
        spark.createDataFrame(
            [(8001, hotdoc + "x"), (8004, "a" * 40 + "bbb"), (8005, "a" * 55)],
            "doc_id long, text string",
        )
    )
    sigs = edit_signatures(corpus, "doc_id", "text")
    n = new.select(F.col("doc_id").alias("new_id"), F.col("text").alias("tn")).where(
        F.col("tn").isNotNull()
    )
    c = corpus.select(
        F.col("doc_id").alias("corpus_id"), F.col("text").alias("tc")
    ).where(F.col("tc").isNotNull())
    want = sorted(
        tuple(r)
        for r in (
            n.crossJoin(c)
            .where(F.col("new_id") != F.col("corpus_id"))
            .withColumn("dist", F.levenshtein("tn", "tc", 10))
            .where(F.col("dist") >= 0)
            .select("new_id", "corpus_id", F.col("dist").cast("long"))
            .collect()
        )
    )
    for cap in (None, 5):
        got = sorted(
            tuple(r)
            for r in incremental_edit_dups(
                new, sigs, corpus, "doc_id", "text", 10, stop_gram_min_df=cap
            ).collect()
        )
        assert got == want, f"cap={cap}"
    assert (9001, 8001, 1) in want  # the degenerate hot-gram pair is real


def test_string_ids_rejected_loudly(spark):
    """connected_components (and therefore the dedup keep wrapper) is
    integral-id by construction — string keys must fail with the mapping
    hint, not a deep Arrow/analysis error."""
    from chess_lakehouse_spark.operators.dedup import edit_distance_dedup

    df = spark.createDataFrame(
        [("a", "kitten"), ("b", "kittenx")], "id string, text string"
    )
    with pytest.raises(ValueError, match="integral"):
        edit_distance_dedup(df, "id", "text", max_dist=2).collect()


def test_edit_distance_join_two_tables(spark):
    """Two-table record-linkage form: every cross pair within d, shared
    ids excluded as self-pairs, thin composition over the staged-signature
    machinery."""
    from chess_lakehouse_spark.operators.dedup import edit_distance_join

    left = spark.createDataFrame(
        [(1, "the yellow king"), (2, "an orphan record"), (7, "shared id")],
        "id long, text string",
    )
    right = spark.createDataFrame(
        [(10, "the yellow kings"), (11, "zz totally different zz"),
         (7, "shared id")],
        "id long, text string",
    )
    got = sorted(
        tuple(r) for r in edit_distance_join(left, right, "id", "text", 2).collect()
    )
    assert got == [(1, 10, 1)]  # the near pair; self-pair 7 excluded


def test_ascii_scope_regex_is_engine_identical(spark):
    """The q_dedup_edit scope anchor is \\z, not $: Java's $ also matches
    BEFORE a final line terminator, so 'abc\\n' would pass the Spark
    filter but fail the RE2 oracle filter — with \\z both engines agree
    on every hostile input (review finding, fixed)."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import EDIT_DIST_ASCII_RE

    hostile = ["abc", "abc\n", "abc\r", "a\nb", "héllo", "", " ~", "\n"]
    sdf = spark.createDataFrame([(t,) for t in hostile], "t string")
    got_spark = [
        bool(r.m)
        for r in sdf.select(F.col("t").rlike(EDIT_DIST_ASCII_RE).alias("m"))
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT regexp_matches(?, ?)", [t, EDIT_DIST_ASCII_RE]
        ).fetchone()[0]
        for t in hostile
    ]
    con.close()
    assert got_spark == got_duck
    assert got_spark == [True, False, False, False, False, True, True, False]
