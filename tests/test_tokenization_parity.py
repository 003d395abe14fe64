"""Cross-engine tokenization parity — the portability pillar under every
text oracle. Sweeps every codepoint through BOTH engines' split and pins:

1. Java regex ``\\s`` and RE2 ``\\s`` genuinely diverge (on exactly
   U+000B vertical tab) — the reason the suite tokenizes with the
   explicit WS_SPLIT class instead;
2. the WS_SPLIT class behaves identically in Spark (Java regex) and
   DuckDB (RE2) for EVERY swept codepoint, vertical tab included.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from chess_lakehouse_spark.functions.text import WS_SPLIT

#: ASCII + Latin-1 + the usual unicode-space suspects + separators.
SWEEP = (
    list(range(1, 0x300))
    + [0x85, 0x2000, 0x2007, 0x200B, 0x2028, 0x2029, 0x205F, 0x3000, 0xFEFF]
    + [0x4E2D, 0x1F389]  # CJK, emoji (astral)
)


def _cases():
    out = []
    for cp in SWEEP:
        ch = chr(cp)
        if ch in "'\"\\":  # quote/escape chars: covered by dedicated tests
            continue
        out.append((cp, f"a{ch}b"))
    return out


def _duck_split(rows, pattern_sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(cp BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return {
        cp: toks
        for cp, toks in con.execute(
            f"SELECT cp, string_split_regex(s, '{pattern_sql}') FROM t"
        ).fetchall()
    }


def test_ws_split_class_identical_in_both_engines(spark):
    rows = _cases()
    df = spark.createDataFrame(rows, "cp long, s string")
    got = {
        r["cp"]: r["toks"]
        for r in df.select(
            "cp", F.split(F.col("s"), WS_SPLIT).alias("toks")
        ).collect()
    }
    # WS_SPLIT is already literal-safe for a DuckDB SQL string ('\t' etc.
    # pass through to RE2 as escapes)
    duck = _duck_split(rows, WS_SPLIT)
    diverging = [cp for cp in got if got[cp] != duck[cp]]
    assert diverging == [], [
        (hex(cp), got[cp], duck[cp]) for cp in diverging[:5]
    ]
    # and the class actually splits all five ASCII whitespace chars + VT
    for cp in (0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20):
        assert got[cp] == ["a", "b"], hex(cp)


def test_backslash_s_divergence_is_exactly_vertical_tab(spark):
    """Documents WHY WS_SPLIT exists: if the engines' \\s ever drift
    further apart (or converge), this pin flags it so the contract can be
    re-derived instead of silently rotting."""
    rows = _cases()
    df = spark.createDataFrame(rows, "cp long, s string")
    got = {
        r["cp"]: r["toks"]
        for r in df.select(
            "cp", F.split(F.col("s"), r"\s+").alias("toks")
        ).collect()
    }
    duck = _duck_split(rows, r"\s+")
    diverging = sorted(cp for cp in got if got[cp] != duck[cp])
    assert diverging == [0x0B]


def test_split_edge_semantics_identical(spark):
    """Leading/trailing/empty-string split behavior: Spark SQL split
    (default limit -1, trailing empties KEPT — unlike Java String.split's
    limit-0 default) must agree with DuckDB string_split_regex, because
    unfiltered len(split(...)) appears in quality oracles."""
    cases = [(0, "a b"), (1, "a b "), (2, " a b"), (3, "  "), (4, ""), (5, "a b  c   ")]
    df = spark.createDataFrame(cases, "id long, t string")
    sp = {
        r["id"]: r["toks"]
        for r in df.select("id", F.split(F.col("t"), WS_SPLIT).alias("toks")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", cases)
    for i, toks in con.execute(
        f"SELECT id, string_split_regex(t, '{WS_SPLIT}') FROM t ORDER BY id"
    ).fetchall():
        assert toks == sp[i], (cases[i][1], sp[i], toks)


def test_pii_pattern_parity(spark):
    """The PII redaction patterns claim a Java-regex/RE2-portable subset;
    pin it on adversarial inputs — digit-run \\b guards, dotted hostnames,
    over-long IPs, unicode local parts (correctly NOT matched by the
    ASCII classes in either engine)."""
    from chess_lakehouse_spark.functions.text import PII_PATTERNS, scrub_pii

    cases = [
        "mail me at a.b+c%d@ex-ample.co.uk now",
        "call 555-123-4567 or 555.123.4567 or 555 123 4567",
        "91234-567-89012 should not fully redact",
        "ip 192.168.0.1 and 999.999.999.999 and 1.2.3.4.5",
        "a@b.c not-an-email @nope x@y.zz",
        "edge.email@sub.domain.museum.",
        "12.34.56.78text 555-123-4567x",
        "unicode ñ@é.com 中文@例子.中国",
    ]
    rows = [(i, s) for i, s in enumerate(cases)]
    df = spark.createDataFrame(rows, "id long, t string")
    sp = {r["id"]: r["o"] for r in df.select("id", scrub_pii(F.col("t")).alias("o")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    expr = "t"
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat.replace(chr(39), chr(39) * 2)}', '{repl}', 'g')"
    for i, o in con.execute(f"SELECT id, {expr} FROM t ORDER BY id").fetchall():
        assert o == sp[i], (cases[i], sp[i], o)


def test_label_centroid_mean_tie_is_portable(spark):
    """Regression for the 7th-decimal quotient tie found at sf0.1
    (sum 0.616992 over 192 vectors -> mean exactly 0.0032135): the
    integer half-away rounding in label_centroids must agree with DuckDB
    on the synthetic reproduction, where double-side ROUND did not."""
    from chess_lakehouse_spark.operators.similarity import label_centroids

    n = 192
    # 192 values of 0.003213 plus one bump: sum = 0.616992 -> exact tie
    vals = [0.003213] * n
    vals[0] = 0.003213 + 0.000096  # 0.616992 total at decimal(18,6)
    df = spark.createDataFrame(
        [(9, [float(v)] ) for v in vals], "label long, embedding array<float>"
    )
    got = label_centroids(df, "label", "embedding").collect()
    assert len(got) == 1
    r = got[0]
    con = duckdb.connect()
    con.register("emb_pd", df.toPandas())
    con.execute("CREATE VIEW embeddings AS SELECT * FROM emb_pd")
    from chess_lakehouse_spark.suite.llm import ORACLES

    duck = con.execute(ORACLES["label_centroids"]).fetchall()
    assert [(r["label"], r["pos"], r["mval"], r["n_vecs"])] == duck
    # half-away tie resolves UP
    assert r["mval"] == 0.003214


def test_pii_parity_holds_on_all_ascii_contexts(spark):
    """The \\b-guard agreement domain, swept: on ASCII-only text the two
    engines' \\b definitions coincide, so scrub_pii must agree exactly on
    random ASCII strings seeded with PII-shaped fragments (the non-ASCII
    divergence is documented on PII_PATTERNS — Java's \\b is
    Unicode-aware, RE2's is ASCII)."""
    import random
    import string

    from chess_lakehouse_spark.functions.text import PII_PATTERNS, scrub_pii

    rng = random.Random(42)
    alph = string.ascii_letters + string.digits + " .-_@#?&/:;%+='\"()\t"
    frags = ["a@b.co", "10.1.2.3", "555-123-4567", "555.123.4567",
             "x@sub.do-main.org", "999.999.999.999", "0.0.0.0", "@", "..."]
    cases = []
    for _ in range(2000):
        parts = [
            rng.choice(frags) if rng.random() < 0.4 else
            "".join(rng.choice(alph) for _ in range(rng.randint(0, 10)))
            for _ in range(rng.randint(1, 6))
        ]
        cases.append("".join(parts))
    rows = [(i, s) for i, s in enumerate(cases)]
    df = spark.createDataFrame(rows, "id long, t string")
    sp = {r["id"]: r["o"] for r in df.select("id", scrub_pii(F.col("t")).alias("o")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE pt(id BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO pt VALUES (?,?)", rows)
    expr = "t"
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat.replace(chr(39), chr(39) * 2)}', '{repl}', 'g')"
    for i, o in con.execute(f"SELECT id, {expr} FROM pt ORDER BY id").fetchall():
        assert o == sp[i], (cases[i], sp[i], o)
    con.close()


def test_pii_nonascii_boundary_divergence_is_as_documented(spark):
    """Canary for the documented \\b portability boundary: 'é10.1.2.3'
    redacts under RE2 (é is a non-word char for its ASCII \\b) but NOT
    under Java (Unicode-aware \\b sees é as a word char, no boundary).
    If either engine changes this behavior, the PII_PATTERNS contract
    comment must be revisited."""
    from chess_lakehouse_spark.functions.text import scrub_pii

    raw = "é10.1.2.3"
    sp = (
        spark.createDataFrame([(raw,)], "t string")
        .select(scrub_pii(F.col("t")).alias("o"))
        .first()["o"]
    )
    assert sp == raw  # Java: no boundary after é -> unredacted
    con = duckdb.connect()
    dk = con.execute(
        r"SELECT regexp_replace('é10.1.2.3', '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')"
    ).fetchone()[0]
    con.close()
    assert dk == "é<IP>"  # RE2: ASCII \b -> boundary -> redacted
