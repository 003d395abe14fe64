"""Type-allowlist guard over every oracle's DuckDB output schema.

Round-4 postmortem: `chunk_dedup`, `dq_check`, `budget_sample` were
driver-red with rows/schema matching but hash mismatching. Root cause: an
un-cast integer SUM (plain or windowed) in the oracle SQL widens to DuckDB
HUGEINT (int128), which the driver's order-insensitive value-hasher
represents differently from Spark's BIGINT even when the values are
numerically equal. (Same class as round 1's collect_set ndarray episode.)

The contract this test enforces: every oracle's output schema may contain
ONLY types the driver hashes identically to their Spark counterparts —
BIGINT, INTEGER, DOUBLE, VARCHAR, BOOLEAN. Anything else (HUGEINT, DECIMAL,
TIMESTAMP, DATE, lists/structs, FLOAT) must be explicitly cast in the oracle
string before it reaches the driver.

Uses DuckDB's relation API (schema inference only — queries are not
executed), so the whole sweep is cheap enough to run over all oracles.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from chess_lakehouse_spark.catalog import TESTDATA_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Types the driver's value-hasher is known to represent identically to the
# matching Spark type (long, int, double, string, boolean).
ALLOWED_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def _offending_columns(con, sql: str) -> list[tuple[str, str]]:
    rel = con.sql(sql)
    return [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in ALLOWED_TYPES
    ]


def test_every_oracle_output_type_is_allowlisted(con):
    oracles = entry_mod.oracle_sql()
    assert oracles, "oracle_sql() returned nothing"
    bad: dict[str, list[tuple[str, str]]] = {}
    for name, sql in sorted(oracles.items()):
        offending = _offending_columns(con, sql)
        if offending:
            bad[name] = offending
    assert not bad, (
        "oracles emit driver-unsafe types (cast them in the SQL, e.g. "
        f"CAST(SUM(...) AS BIGINT)): {bad}"
    )


def test_guard_catches_hugeint(con):
    """Negative control: the exact round-4 bug shape must be flagged."""
    sql = "SELECT SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n FROM orders"
    offending = _offending_columns(con, sql)
    assert offending == [("n", "HUGEINT")]


def test_guard_catches_windowed_sum_hugeint(con):
    sql = (
        "SELECT o_orderkey, SUM(o_orderkey) OVER (ORDER BY o_orderkey) AS c "
        "FROM orders"
    )
    offending = _offending_columns(con, sql)
    assert ("c", "HUGEINT") in offending


def test_guard_catches_decimal_and_timestamp(con):
    offending = _offending_columns(
        con, "SELECT CAST(1 AS DECIMAL(18,6)) AS d, now() AS ts"
    )
    assert {c for c, _ in offending} == {"d", "ts"}


# (The r8 staging-era check for the then-unregistered candidates was
# removed at registration: dedup_span / quality_gopher / bm25_batch /
# corpus_sketch_counts are now in suite ORACLES and covered by the full
# sweep above.)


def test_staged_r9_candidate_oracle_types_are_allowlisted(con):
    """The r9 staging candidates' oracles (defined in suite/llm.py ahead
    of registration) must already satisfy the driver type allowlist —
    the r4 postmortem class caught BEFORE a red driver row, not after."""
    from chess_lakehouse_spark.suite.llm import (
        HTML_STRIP_ORACLE,
        LM_STAGED_ORACLE,
        PII_SCAN_ORACLE,
    )

    assert _offending_columns(con, LM_STAGED_ORACLE) == []
    assert _offending_columns(con, PII_SCAN_ORACLE) == []
    assert _offending_columns(con, HTML_STRIP_ORACLE) == []
