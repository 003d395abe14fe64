"""PII audit counts (functions/text.py:pii_counts) and the r9 staging
candidate q_pii_scan against its suite-defined oracle (PII_SCAN_ORACLE
— regexes generated from the same PII_PATTERNS the Spark chain
compiles)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.functions.text import pii_counts
from chess_lakehouse_spark.suite.llm import PII_SCAN_ORACLE, q_pii_scan

CASES = [
    # (text, n_emails, n_phones, n_ips)
    ("mail me at a.b+c@ex.org thanks", 1, 0, 0),
    ("call 555-123-4567 or 555.987.6543", 0, 2, 0),
    ("host 10.0.3.45 and 192.168.1.1", 0, 0, 2),
    ("x@y.io 555-000-1111 1.2.3.4", 1, 1, 1),
    ("no pii here", 0, 0, 0),
    ("91234-567-89012 is not a phone", 0, 0, 0),  # \b guards hold
    (None, 0, 0, 0),  # NULL text coalesces to ''
]


def test_counts_pinned(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, text string"
    )
    got = {
        r["id"]: (r["n_emails"], r["n_phones"], r["n_ips"])
        for r in pii_counts(df, "id", "text").collect()
    }
    for i, (_, e, p, ip) in enumerate(CASES):
        assert got[i] == (e, p, ip), f"case {i}"


def test_redacted_len_matches_scrub(spark):
    from chess_lakehouse_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES) if t], "id long, text string"
    )
    got = {
        r["id"]: r["redacted_len"]
        for r in pii_counts(df, "id", "text").collect()
    }
    want = {
        r["id"]: len(r["s"])
        for r in df.select("id", scrub_pii(F.col("text")).alias("s")).collect()
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_q_pii_scan_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof for the r9 candidate: exact values,
    driver-safe types."""
    sdf = q_pii_scan(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == ["bigint", "int", "int", "int", "int"]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    drows = sorted(tuple(r) for r in con.execute(PII_SCAN_ORACLE).fetchall())
    con.close()
    assert len(srows) > 0
    assert srows == drows


def test_q_pii_scan_discriminates(spark):
    """Every pattern class fires on the laced corpus, and not uniformly."""
    out = q_pii_scan(spark, "/root/testdata/sf0.001").collect()
    assert all(r["n_emails"] >= 1 for r in out)
    phones = {r["n_phones"] for r in out}
    ips = {r["n_ips"] for r in out}
    assert phones == {0, 1} and ips == {0, 1}
