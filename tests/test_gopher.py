"""Gopher quality-rule battery (Rae et al. 2021, Appendix A): pinned
against hand-computed cases and the canonical DuckDB oracle template,
which lives in suite/llm.py (promoted at r8 registration; this file
imports it so engine test and gated oracle cannot diverge)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.functions.text import (
    GOPHER_MIN_STOP_HITS,
    GOPHER_STOPS,
    gopher_rules,
)
from chess_lakehouse_spark.suite.llm import gopher_oracle_sql

#: Fixture-tuned thresholds for the gated query (suite/llm.py
#: GOPHER_Q_MIN_WORDS/GOPHER_Q_MIN_STOPS carry the same values): the
#: synthetic token-soup corpus tops out at few required-stopword hits and
#: 99 words, so the paper's (50 words, 2 stops) would reject every row —
#: a gate that never fires verifies nothing. These keep every other rule
#: at the paper's value while letting the fixture corpus split on both
#: sides.
FIXTURE_MIN_WORDS = 30
FIXTURE_MIN_STOP_HITS = 1


def gopher_oracle(min_words=FIXTURE_MIN_WORDS, min_stops=FIXTURE_MIN_STOP_HITS) -> str:
    return gopher_oracle_sql(min_words, min_stops)


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


def test_gopher_stop_hits_case_and_punct_normalized(spark):
    """'The' and 'with,' count toward the required-stopword rule (r7
    ADVICE: the exact-match form was stricter than reference Gopher /
    FineWeb implementations on real prose); substrings still don't."""
    rows = [
        (0, "The cat OF. doom With, that! stuff"),
        (1, "THE BE TO"),
        (2, "neither herewith nothe 'quoted'"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["stop_hits"] for r in gopher_rules(df, "doc_id", "text").collect()}
    assert got[0] == 4  # the, of, with, that
    assert got[1] == 3  # the, be, to
    assert got[2] == 0  # membership is whole-token, post-normalization


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
        # mixed-case / edge-punctuated stopwords — must count via the
        # ASCII-lower + edge-punct normalization (raw for other metrics)
        "The", "OF.", "With,", "THAT!", "(and)", "'be'", "to:",
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
        from chess_lakehouse_spark.functions.text import (
            _ASCII_LOWER,
            _ASCII_UPPER,
            GOPHER_EDGE_PUNCT,
        )

        lower_map = str.maketrans(_ASCII_UPPER, _ASCII_LOWER)
        ntoks = {t.translate(lower_map).strip(GOPHER_EDGE_PUNCT) for t in toks}
        stops = sum(1 for w in GOPHER_STOPS if w in ntoks)
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


# ---------------------------------------------------------------------------
# blocklist gates (C4 badwords / RefinedWeb host blocklist)
# ---------------------------------------------------------------------------


def test_badwords_gate_normalization_and_null(spark):
    """Blocked-word membership uses the Gopher stop-hit normalization:
    case-insensitive, edge punctuation trimmed; substrings do NOT match;
    NULL text survives."""
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.functions.text import badwords_gate

    rows = [
        (1, "a perfectly clean document"),
        (2, "contains the Word BADTOK here"),       # case
        (3, "ends with badtok."),                   # edge punct
        (4, "badtokens is a different token"),      # substring: keep
        (5, None),                                  # NULL: keep
        (6, "multi list othertok hit"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in df.where(
            badwords_gate(F.col("text"), ["BadTok", "othertok"])
        ).collect()
    }
    assert kept == {1, 4, 5}


def test_host_blocklist_gate_subdomains_and_null(spark):
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.functions.urls import host_blocklist_gate

    rows = [
        (1, "https://ok.example/x"),
        (2, "https://blocked.example/x"),
        (3, "https://www.Blocked.example/y"),       # www + case
        (4, "http://sub.blocked.example/z"),        # subdomain
        (5, "https://notblocked.example/x"),        # suffix-of-name: keep
        (6, None),                                  # NULL: keep
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = {
        r["doc_id"]
        for r in df.where(
            host_blocklist_gate(F.col("url"), ["blocked.example"])
        ).collect()
    }
    assert kept == {1, 5, 6}
    # exact-only mode keeps the subdomain
    kept2 = {
        r["doc_id"]
        for r in df.where(
            host_blocklist_gate(
                F.col("url"), ["blocked.example"], include_subdomains=False
            )
        ).collect()
    }
    assert kept2 == {1, 4, 5, 6}
    # empty list keeps everything
    assert df.where(host_blocklist_gate(F.col("url"), [])).count() == 6


def test_clean_corpus_blocklist_flags(spark, tmp_path, capsys):
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    lines = []
    for i in range(10):
        text = " ".join(f"u{i}tok{j}" for j in range(40))
        if i == 3:
            text += " Forbidden."
        host = "spam.example" if i == 4 else f"site{i}.example"
        lines.append(json.dumps({
            "doc_id": i, "text": text, "lang": "en", "source": "s0",
            "url": f"https://{host}/p{i}",
        }))
    src = tmp_path / "in"
    src.mkdir()
    (src / "p.jsonl").write_text("\n".join(lines) + "\n")
    (tmp_path / "hosts.txt").write_text("# comment\nspam.example\n")
    (tmp_path / "words.txt").write_text("forbidden\n")
    out = tmp_path / "out"
    pipeline_cli.main([
        "clean-corpus", "--inDir", str(src), "--outDir", str(out),
        "--urlCol", "url",
        "--blockedHostsFile", str(tmp_path / "hosts.txt"),
        "--badwordsFile", str(tmp_path / "words.txt"),
        "--minQuality", "-99", "--threshold", "0.5", "--evalFrac", "0.3",
    ])
    published = spark.read.json(str(out / "corpus")).collect()
    ids = sorted(r.doc_id for r in published)
    assert ids == [0, 1, 2, 5, 6, 7, 8, 9]  # 3 (badword) and 4 (host) dropped


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_badwords_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof for the blocklist gate: exact values,
    driver-safe types, both local scales, corpus split on both sides."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import BADWORDS_ORACLE, q_badwords

    sdf = q_badwords(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == ["bigint", "boolean"]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    rel = con.sql(BADWORDS_ORACLE)
    assert all(str(t) in {"BIGINT", "BOOLEAN"} for t in rel.types)
    drows = sorted(tuple(r) for r in con.execute(BADWORDS_ORACLE).fetchall())
    con.close()
    kept = [r for r in srows if r[1]]
    assert 0 < len(kept) < len(srows)  # splits both ways
    assert srows == drows


def test_url_badwords_gate_substring_semantics(spark):
    """URL fragments hit ANYWHERE in the lowercased URL (substring by
    design — URL words are not whitespace-delimited); NULL and empty-list
    behavior match the other gates."""
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.functions.urls import url_badwords_gate

    rows = [
        (1, "https://ok.example/articles/chess"),
        (2, "https://bad.example/ADULT-content/x"),   # case-folded hit
        (3, "https://ok.example/page?adult=1"),        # query-string hit
        (4, "https://casino.example/home"),            # host hit
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = {
        r.doc_id
        for r in df.where(
            url_badwords_gate(F.col("url"), ["adult", "casino"])
        ).collect()
    }
    assert kept == {1, 5}
    assert df.where(url_badwords_gate(F.col("url"), [])).count() == 5


def test_clean_corpus_url_words_flag(spark, tmp_path):
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    lines = []
    for i in range(8):
        text = " ".join(f"w{i}tok{j}" for j in range(40))
        path = "spinclub" if i == 2 else f"page{i}"
        lines.append(json.dumps({
            "doc_id": i, "text": text, "lang": "en", "source": "s0",
            "url": f"https://site{i}.example/{path}",
        }))
    src = tmp_path / "in"
    src.mkdir()
    (src / "p.jsonl").write_text("\n".join(lines) + "\n")
    (tmp_path / "uw.txt").write_text("# fragments\nspin\n")
    out = tmp_path / "out"
    pipeline_cli.main([
        "clean-corpus", "--inDir", str(src), "--outDir", str(out),
        "--urlCol", "url", "--blockedUrlWordsFile", str(tmp_path / "uw.txt"),
        "--minQuality", "-99", "--threshold", "0.5", "--evalFrac", "0.3",
    ])
    ids = sorted(r.doc_id for r in spark.read.json(str(out / "corpus")).collect())
    assert ids == [0, 1, 3, 4, 5, 6, 7]  # 2 dropped by URL fragment


def test_host_blocklist_entry_forms_normalize_to_url_host_identity(spark):
    """Real-world list forms — 'www.X', '.X' wildcard, mixed case — must
    fold to the same www-stripped lowercase identity as url_host; without
    that a 'www.badsite.com' entry silently never matches anything."""
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.functions.urls import host_blocklist_gate

    rows = [
        (1, "https://badsite.example/x"),
        (2, "https://www.badsite.example/y"),
        (3, "https://sub.badsite.example/z"),
        (4, "https://goodsite.example/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    for entry in ("www.badsite.example", ".badsite.example", "BADSITE.example"):
        kept = {
            r.doc_id
            for r in df.where(host_blocklist_gate(F.col("url"), [entry])).collect()
        }
        assert kept == {4}, entry


def test_badwords_entries_ride_token_normalization(spark):
    """An entry carrying edge punctuation or case ('Bad!') must still hit
    — entries pass through the SAME trim chain as document tokens."""
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.functions.text import (
        badwords_gate,
        normalize_badwords,
    )

    assert normalize_badwords(["Bad!", "(bad)", " ok ", "!!"]) == ["bad", "ok"]
    df = spark.createDataFrame(
        [(1, "a bad word here"), (2, "all clean here")],
        "doc_id long, text string",
    )
    kept = {
        r.doc_id
        for r in df.where(badwords_gate(F.col("text"), ["Bad!"])).collect()
    }
    assert kept == {2}
