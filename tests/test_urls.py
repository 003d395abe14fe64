"""URL canonicalization (functions/urls.py) and the gated url_canonical
query: hand-pinned canonical forms, a seeded cross-engine fuzz over the
composed URL grammar (Spark chain vs the SAME regex constants through
DuckDB via the suite template _URL_CANON_CORE — one definition, two
engines), the registered suite oracle exercised exactly as the driver
runs it, and the dedup/cap compositions."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark import suite
from chess_lakehouse_spark.functions.urls import (
    host_cap,
    url_canonicalize,
    url_dedup_groups,
    url_host,
)
from chess_lakehouse_spark.suite.llm import _URL_CANON_CORE

# (raw url, expected canonical, expected host)
PINNED = [
    (
        "https://www.Example.COM/Path/To/Doc?utm_source=x&id=5&utm_medium=y#frag",
        "example.com/Path/To/Doc?id=5",
        "example.com",
    ),
    ("HTTP://EXAMPLE.com/", "example.com", "example.com"),
    ("https://example.com", "example.com", "example.com"),
    ("  https://www.site.org/a/b/  ", "site.org/a/b", "site.org"),
    # only ONE leading www. is stripped; inner labels stay
    ("https://sub.www.host.net/x", "sub.www.host.net/x", "sub.www.host.net"),
    # tracking params drop case-insensitively, real params survive
    ("https://host.net/x?a=1&utm_a=2&b=3&gclid=g", "host.net/x?a=1&b=3", "host.net"),
    ("https://host.net/x?UTM_SOURCE=Up&ok=1", "host.net/x?ok=1", "host.net"),
    ("https://host.net/x?utm_a=1&utm_b=2", "host.net/x", "host.net"),
    # tracking names anchored to ?/& — substrings of LONGER param names
    # survive (r8 ADVICE: '?id=1&xgclid=2' must NOT collapse to '?id=1&x')
    ("https://a.com/p?id=1&xgclid=2", "a.com/p?id=1&xgclid=2", "a.com"),
    ("https://a.com/p?myutm_source=1&ok=2", "a.com/p?myutm_source=1&ok=2", "a.com"),
    # back-to-back tracking params: non-rescanning global replace leaves
    # '&' runs, collapsed by AMP_RUN_RE
    ("https://a.com/p?utm_a=1&utm_b=2&id=3", "a.com/p?id=3", "a.com"),
    ("https://a.com/p?gclid=g&utm_a=1", "a.com/p", "a.com"),
    ("https://a.com/p?xfbclid=1&fbclid=2", "a.com/p?xfbclid=1", "a.com"),
    # path case preserved (RFC 3986: paths are case-sensitive)
    ("HtTpS://WwW.MiXeD.CoM/KeepCase", "mixed.com/KeepCase", "mixed.com"),
    # scheme strip is http/https only — other schemes pass through
    ("ftp://keep.scheme.com/a", "ftp://keep.scheme.com/a", "ftp:"),
    ("no-scheme.com/path?msclkid=m", "no-scheme.com/path", "no-scheme.com"),
    ("www.only-www.com", "only-www.com", "only-www.com"),
    # trailing slash BEFORE a surviving query is preserved (tail-only trim)
    ("https://www.a.com/Doc/?id=1", "a.com/Doc/?id=1", "a.com"),
    ("https://a.com/p#frag1#frag2", "a.com/p", "a.com"),
    ("https://a.com/p?&a=1", "a.com/p?a=1", "a.com"),
    ("https://a.com/??", "a.com", "a.com"),
    ("", "", ""),
]


def _fuzz_urls(n: int = 400) -> list[str]:
    rng = random.Random(20260814)
    schemes = ["https://", "HTTP://", "HtTpS://", ""]
    wwws = ["", "www.", "WWW.", "www2."]
    hosts = ["Example.COM", "a.b.C.net", "host-1.io", "x.org:8080"]
    paths = ["", "/", "/Path/To/Doc", "/p/", "/UPPER/low"]
    queries = [
        "",
        "?a=1",
        "?utm_source=x",
        "?utm_source=x&a=1",
        "?a=1&utm_medium=m&b=2",
        "?UTM_X=1&utm_y=2",
        "?fbclid=f",
        "?a=%20&gclid=g&z=9",
        "?&a=1",
        "?msclkid=",
        # boundary-collision shapes: tracking names as substrings of
        # longer param names, and back-to-back tracking params
        "?id=1&xgclid=2",
        "?myutm_source=1",
        "?utm_a=1&utm_b=2&c=3",
        "?xfbclid=1&fbclid=2",
        "?utm_a=1&utm_b=2&utm_c=3",
    ]
    frags = ["", "#f", "#A#B", "#utm_source=x"]
    return [
        rng.choice(schemes)
        + rng.choice(wwws)
        + rng.choice(hosts)
        + rng.choice(paths)
        + rng.choice(queries)
        + rng.choice(frags)
        for _ in range(n)
    ]


@pytest.mark.parametrize("raw,canon,host", PINNED)
def test_pinned_canonical_forms(spark, raw, canon, host):
    row = (
        spark.createDataFrame([(raw,)], "url string")
        .select(
            url_canonicalize(F.col("url")).alias("c"),
            url_host(F.col("url")).alias("h"),
        )
        .first()
    )
    assert (row["c"], row["h"]) == (canon, host)


def test_cross_engine_fuzz_via_suite_template(spark):
    """Every composed grammar variant canonicalizes identically through
    the Spark Column chain and through DuckDB evaluating the suite's
    _URL_CANON_CORE — which interpolates the SAME Python regex constants,
    so a pattern edit on either side breaks this immediately."""
    urls = _fuzz_urls()
    sdf = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: (r["c"], r["h"])
        for r in sdf.select(
            "doc_id",
            url_canonicalize(F.col("url")).alias("c"),
            url_host(F.col("url")).alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"doc_id": range(len(urls)), "url": urls}))
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"WITH {_URL_CANON_CORE} SELECT doc_id, url_canon, host FROM canon"
        ).fetchall()
    }
    con.close()
    assert got == want


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_url_canonical_query_matches_registered_oracle(spark, sf_dir):
    """Driver-style check: the registered QUERIES entry against the
    registered ORACLES SQL, self-contained over the documents view."""
    sdf = suite.QUERIES["url_canonical"](spark, sf_dir)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    drows = sorted(tuple(r) for r in con.execute(suite.ORACLES["url_canonical"]).fetchall())
    con.close()
    assert len(srows) > 0
    assert srows == drows


def test_url_canonical_cap_discriminates_at_driver_sf(spark):
    """The per-host cap must actually drop rows at the driver's
    correctness sf (0.01: ~71 docs/host vs cap 40) — a cap that keeps
    everything verifies nothing."""
    out = suite.QUERIES["url_canonical"](spark, "/root/testdata/sf0.01")
    kept = out.count()
    total = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").count()
    n_hosts = out.select("host").distinct().count()
    assert n_hosts == 7
    assert kept == n_hosts * suite.llm.URL_CAP_N < total


def test_url_dedup_groups_collapses_aliases(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.A.com/x?utm_source=s"),
            (2, "HTTP://a.com/x/"),
            (3, "a.com/x#frag"),
            (4, "https://a.com/y"),
        ],
        "id long, url string",
    )
    rows = {
        r["url_canon"]: (r["canonical_id"], r["n_copies"])
        for r in url_dedup_groups(df, "id", "url").collect()
    }
    assert rows == {"a.com/x": (1, 3), "a.com/y": (4, 1)}


def test_host_cap_membership_is_nested(spark):
    """top_n_per_group contract holds through the URL plumbing: the kept
    set at n=3 is a subset of the kept set at n=6, per host."""
    df = spark.createDataFrame(
        [(i, f"https://h{i % 3}.com/p{i}") for i in range(60)],
        "id long, url string",
    )
    small = {r["id"] for r in host_cap(df, "id", "url", n=3, seed=7).collect()}
    big = {r["id"] for r in host_cap(df, "id", "url", n=6, seed=7).collect()}
    assert len(small) == 9 and len(big) == 18
    assert small < big


def test_adversarial_random_string_parity(spark):
    """Beyond the URL grammar: fully random printable strings (including
    non-ASCII letters, stray delimiters, half-formed schemes) must
    canonicalize identically in both engines — the chain uses no \\b and
    no $ anchor, so the Java/RE2 agreement holds on arbitrary input,
    not just well-formed URLs."""
    import random as _random
    import string as _string

    rng = _random.Random(99)
    alph = (_string.ascii_letters + _string.digits
            + " .-_@#?&/<>:;%+=!'\"(){}[]|\\~^$*\t" + "éü…–")
    frags = ["http://", "HTTPS://www.", "utm_a=1", "&utm_b=2#f", "www.",
             "?utm_source=", "//", "#", "?&"]
    texts = []
    for _ in range(1500):
        parts = [
            rng.choice(frags) if rng.random() < 0.4 else
            "".join(rng.choice(alph) for _ in range(rng.randint(0, 10)))
            for _ in range(rng.randint(1, 5))
        ]
        texts.append("".join(parts))
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: (r["c"], r["h"])
        for r in sdf.select(
            "doc_id",
            url_canonicalize(F.col("url")).alias("c"),
            url_host(F.col("url")).alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"doc_id": range(len(texts)), "url": texts}))
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"WITH {_URL_CANON_CORE} SELECT doc_id, url_canon, host FROM canon"
        ).fetchall()
    }
    con.close()
    assert got == want


def test_host_cap_raises_on_preexisting_host_column(spark):
    """A pre-existing 'host' column must raise, not be silently
    overwritten with the derived grouping key (r8 verdict minor #2)."""
    df = spark.createDataFrame(
        [(1, "https://a.com/x", "user-data")], "id long, url string, host string"
    )
    with pytest.raises(ValueError, match="already has one"):
        host_cap(df, "id", "url", n=1)
