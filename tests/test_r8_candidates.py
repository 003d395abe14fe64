"""The three r8 gating candidates, exercised exactly as the driver will
run them: the suite QUERY FUNCTIONS (q_dedup_span / q_quality_gopher /
q_bm25_batch, already in suite/llm.py, not yet registered) against
GATING-FORM oracles — self-contained SQL over the registered views, no
Python-side value splicing, driver-safe types. Promotion = register the
functions + these oracle strings; this file is the proof they're ready."""

from __future__ import annotations

import duckdb
import pytest

from chess_lakehouse_spark.suite import llm

SF_DIR = "/root/testdata/sf0.001"


def gating_oracles() -> dict[str, str]:
    """The exact oracle strings an r8 registration would use."""
    from tests.test_bm25 import _BM25_BATCH_ORACLE_TPL
    from tests.test_gopher import GOPHER_ORACLE, GOPHER_STOPS
    from tests.test_span_dedup import SPAN_DEDUP_ORACLE_TPL

    # bm25_batch: the VALUES query list becomes a doc-derived CTE so the
    # SQL is self-contained AND query_id inherits BIGINT (a VALUES integer
    # literal would be INTEGER — a driver type mismatch, the r4 lesson)
    bm25 = _BM25_BATCH_ORACLE_TPL.replace(
        "queries(query_id, qtext) AS (VALUES {query_values})",
        "queries AS (SELECT doc_id AS query_id, text AS qtext FROM documents "
        f"WHERE doc_id % {llm.BM25_BATCH_MOD} = 0)",
    ).format(k1=1.2, b=0.75, k=llm.BM25_BATCH_K)
    stops = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPS) + "]"
    return {
        "dedup_span": SPAN_DEDUP_ORACLE_TPL.format(k=llm.SPAN_DEDUP_K),
        "quality_gopher": GOPHER_ORACLE.format(
            stops=stops,
            min_words=llm.GOPHER_Q_MIN_WORDS,
            min_stops=llm.GOPHER_Q_MIN_STOPS,
        ),
        "bm25_batch": bm25,
    }


QUERY_FNS = {
    "dedup_span": llm.q_dedup_span,
    "quality_gopher": llm.q_quality_gopher,
    "bm25_batch": llm.q_bm25_batch,
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERY_FNS))
def test_r8_candidate_matches_gating_oracle(spark, con, name):
    sdf = QUERY_FNS[name](spark, SF_DIR)
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(tuple(r) for r in con.execute(gating_oracles()[name]).fetchall())
    assert len(srows) > 0
    assert srows == drows


def test_r8_candidate_oracle_types_are_driver_safe(con):
    from tests.test_oracle_types import ALLOWED_TYPES

    for name, sql in gating_oracles().items():
        rel = con.sql(sql)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) not in ALLOWED_TYPES
        ]
        assert not bad, f"{name}: {bad}"
