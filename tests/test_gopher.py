"""Gopher quality-rule battery (Rae et al. 2021, Appendix A): pinned
against hand-computed cases and a DuckDB oracle template staged for r8
suite promotion (same staging pattern as bm25_batch / span dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chess_lakehouse_spark.functions.text import (
    GOPHER_MIN_STOP_HITS,
    GOPHER_STOPS,
    gopher_rules,
)

#: DuckDB twin of functions/text.py:gopher_rules with the default
#: thresholds — ratios of integers ROUND(·,6); the boolean re-derives the
#: rule conjunction from the SAME rounded values. Staged r8 gating
#: candidate (columns + INT casts already driver-shaped).
GOPHER_ORACLE = r"""
WITH base AS (
  SELECT doc_id,
    COALESCE(text, '') AS text,
    list_filter(string_split_regex(COALESCE(text, ''), '[ \t\n\r\f\x0B]+'), x -> x <> '') AS toks,
    string_split(COALESCE(text, ''), chr(10)) AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
    CAST(len(toks) AS INT) AS n_words,
    CASE WHEN len(toks) = 0 THEN NULL ELSE ROUND(
      CAST(list_reduce(list_transform(toks, x -> len(x)), (a, b) -> a + b) AS DOUBLE)
      / len(toks), 6) END AS mean_word_len,
    CASE WHEN len(toks) = 0 THEN NULL ELSE ROUND(
      CAST((len(text) - len(replace(text, '#', '')))
           + (len(text) - len(replace(text, '...', ''))) // 3
           + (len(text) - len(replace(text, chr(8230), ''))) AS DOUBLE)
      / len(toks), 6) END AS symbol_ratio,
    ROUND(CAST(len(list_filter(lines, l ->
        starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*')
        OR starts_with(ltrim(l), chr(8226)))) AS DOUBLE) / len(lines), 6)
      AS bullet_line_frac,
    ROUND(CAST(len(list_filter(lines, l ->
        ends_with(rtrim(l), '...') OR ends_with(rtrim(l), chr(8230)))) AS DOUBLE)
      / len(lines), 6) AS ellipsis_line_frac,
    CASE WHEN len(toks) = 0 THEN NULL ELSE ROUND(
      CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
      / len(toks), 6) END AS alpha_word_frac,
    CAST(len(list_filter({stops}, w -> list_contains(toks, w))) AS INT) AS stop_hits
  FROM base
)
SELECT *,
  COALESCE(
    n_words >= {min_words} AND n_words <= 100000
    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
    AND symbol_ratio <= 0.1
    AND bullet_line_frac <= 0.9
    AND ellipsis_line_frac <= 0.3
    AND alpha_word_frac >= 0.8
    AND stop_hits >= {min_stops}, FALSE) AS passes_gopher
FROM m
"""

#: Fixture-tuned thresholds for the staged gate query: the synthetic
#: token-soup corpus tops out at 1 required-stopword hit and 99 words, so
#: the paper's (50 words, 2 stops) would reject every row — a gate that
#: never fires verifies nothing. These keep every other rule at the
#: paper's value while letting the fixture corpus split on both sides.
FIXTURE_MIN_WORDS = 30
FIXTURE_MIN_STOP_HITS = 1


def gopher_oracle(min_words=FIXTURE_MIN_WORDS, min_stops=FIXTURE_MIN_STOP_HITS) -> str:
    stops = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPS) + "]"
    return GOPHER_ORACLE.format(stops=stops, min_words=min_words, min_stops=min_stops)


def test_gopher_rules_unit_cases(spark):
    rows = [
        (0, "the cat sat with all of them and that is fine to be " * 6),
        (1, "short text"),
        (2, "- bullet\n- bullet\n- bullet"),
        (3, "### #### " + "zz " * 60),
        (4, ("the of and with that end... \n" * 10) + "tail"),
        (5, "   "),  # whitespace-only: n_words = 0, must not error (ANSI /0)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df, "doc_id", "text").collect()}
    assert got[0]["passes_gopher"] is True
    assert got[1]["passes_gopher"] is False  # word count below 50
    assert got[2]["bullet_line_frac"] == 1.0 and got[2]["passes_gopher"] is False
    assert got[3]["symbol_ratio"] > 0.1 and got[3]["stop_hits"] == 0
    assert got[4]["ellipsis_line_frac"] > 0.3
    assert got[5]["n_words"] == 0 and got[5]["mean_word_len"] is None


def test_gopher_rules_spans_both_outcomes_on_fixtures(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = gopher_rules(
        docs, "doc_id", "text",
        min_words=FIXTURE_MIN_WORDS, min_stop_hits=FIXTURE_MIN_STOP_HITS,
    )
    n_pass = out.where(F.col("passes_gopher")).count()
    n_all = out.count()
    assert 0 < n_pass < n_all  # the gate actually discriminates


def test_gopher_duckdb_oracle_parity(spark):
    import duckdb

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["doc_id"]: (
            r["n_words"], r["mean_word_len"], r["symbol_ratio"],
            r["bullet_line_frac"], r["ellipsis_line_frac"],
            r["alpha_word_frac"], r["stop_hits"], r["passes_gopher"],
        )
        for r in gopher_rules(
            docs, "doc_id", "text",
            min_words=FIXTURE_MIN_WORDS, min_stop_hits=FIXTURE_MIN_STOP_HITS,
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    duck = {row[0]: tuple(row[1:]) for row in con.execute(gopher_oracle()).fetchall()}
    assert duck == got


def test_gopher_null_text_is_empty_doc(spark):
    df = spark.createDataFrame([(0, None), (1, "the of and")], "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df, "doc_id", "text").collect()}
    assert got[0]["n_words"] == 0 and got[0]["passes_gopher"] is False


def test_gopher_metrics_property_fuzz(spark):
    """Randomized docs (bullets, ellipses, hashes, newlines, unicode
    ellipsis, blank lines) against a literal Python re-computation of all
    eight metrics — the fuzz layer under the fixed-case pins."""
    import random
    import re

    rng = random.Random(7)
    pieces = [
        "the", "of", "with", "zz", "a#b", "...", "…", "- item", "* star",
        "x" * 12, "7", "", "  ", "Mixed9", "#tag",
    ]
    docs = []
    for i in range(40):
        n_lines = rng.randint(1, 5)
        lines = [
            " ".join(rng.choice(pieces) for _ in range(rng.randint(0, 8)))
            for _ in range(n_lines)
        ]
        docs.append((i, "\n".join(lines)))

    ws = re.compile(r"[ \t\n\r\f\x0b]+")

    def py_metrics(text):
        toks = [t for t in ws.split(text) if t]
        n = len(toks)
        lines = text.split("\n")
        hashes = text.count("#")
        ell = 0
        for e in ("...", "…"):
            ell += text.count(e) if e == "…" else _count_nonoverlap(text, e)
        bullets = sum(
            1 for ln in lines
            if ln.lstrip(" ").startswith(("-", "*", "•"))
        )
        ells = sum(
            1 for ln in lines
            if ln.rstrip(" ").endswith(("...", "…"))
        )
        alpha = sum(1 for t in toks if re.search("[A-Za-z]", t))
        stops = sum(1 for w in GOPHER_STOPS if w in toks)
        rp = lambda x: round(x, 6)
        return (
            n,
            rp(sum(len(t) for t in toks) / n) if n else None,
            rp((hashes + ell) / n) if n else None,
            rp(bullets / len(lines)),
            rp(ells / len(lines)),
            rp(alpha / n) if n else None,
            stops,
        )

    def _count_nonoverlap(s, sub):
        # left-to-right non-overlapping, matching replace() semantics
        return (len(s) - len(s.replace(sub, ""))) // len(sub)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_words"], r["mean_word_len"], r["symbol_ratio"],
            r["bullet_line_frac"], r["ellipsis_line_frac"],
            r["alpha_word_frac"], r["stop_hits"],
        )
        for r in gopher_rules(df, "doc_id", "text").collect()
    }
    for i, text in docs:
        want = py_metrics(text)
        # plain equality: every metric is an int or a ROUND of an
        # int-ratio double whose 6-decimal rounding cannot tie (small
        # denominators have no exact 10^-7 expansions), so Python round
        # and Spark HALF_UP agree bit-for-bit
        assert got[i] == want, (i, text, got[i], want)


def test_gopher_passes_equals_projection_boolean(spark):
    """The expression form (gopher_passes — streams/pushdown) and the
    projection form (gopher_rules.passes_gopher) must classify every
    fixture doc identically at both default and fixture-tuned thresholds
    — they build on the same metric helper, this pins that they stay
    composed that way."""
    from chess_lakehouse_spark.functions.text import gopher_passes

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for kw in ({}, {"min_words": FIXTURE_MIN_WORDS, "min_stop_hits": FIXTURE_MIN_STOP_HITS}):
        via_rules = {
            r["doc_id"]
            for r in gopher_rules(docs, "doc_id", "text", **kw)
            .where(F.col("passes_gopher"))
            .collect()
        }
        via_expr = {
            r["doc_id"]
            for r in docs.where(gopher_passes(F.col("text"), **kw))
            .select("doc_id")
            .collect()
        }
        assert via_rules == via_expr
