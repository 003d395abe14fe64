"""Ordered-step funnel (operators/relational.py:funnel): planted
progression semantics (strict order, first occurrence, entry-anchored
window), validation, and the staged gating candidate's two-scale oracle
parity."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.relational import funnel


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = funnel(df, "user_id", "event_type", "ts", ["a", "b", "c"], **kw)
    return {r.step_idx: (r.step, r.n_users) for r in out.collect()}


def test_funnel_order_and_first_occurrence(spark):
    """u1 completes in order; u2 has b BEFORE its first a only (no
    progression); u3 stops at b; u4 never enters. The step-2 time is the
    FIRST qualifying b, so u1's later c still counts."""
    rows = [
        (1, "a", _ts(0)), (1, "b", _ts(1)), (1, "c", _ts(2)),
        (2, "b", _ts(0)), (2, "a", _ts(1)),          # b precedes first a
        (3, "a", _ts(0)), (3, "b", _ts(5)),
        (4, "x", _ts(0)),
    ]
    got = _run(spark, rows)
    assert got == {1: ("a", 3), 2: ("b", 2), 3: ("c", 1)}


def test_funnel_emits_zero_rows_for_unreached_steps(spark):
    """A step no user reaches still emits its n_users = 0 row — the
    one-row-per-step contract, and the oracle's aggregate-without-GROUP-BY
    shape (which always emits a row)."""
    rows = [(1, "a", _ts(0)), (2, "a", _ts(1))]
    got = _run(spark, rows)
    assert got == {1: ("a", 2), 2: ("b", 0), 3: ("c", 0)}


def test_funnel_same_instant_does_not_advance(spark):
    """Strictly-after contract: a step at the identical timestamp of the
    previous step does not advance the funnel."""
    rows = [(1, "a", _ts(0)), (1, "b", _ts(0)), (1, "c", _ts(1))]
    got = _run(spark, rows)
    assert got == {1: ("a", 1), 2: ("b", 0), 3: ("c", 0)}


def test_funnel_window_anchored_at_entry(spark):
    """within_seconds measures from the FIRST step's time: u1's c lands
    inside 10 min of entry, u2's identical shape shifted past the window
    drops at step 3."""
    rows = [
        (1, "a", _ts(0)), (1, "b", _ts(4)), (1, "c", _ts(9)),
        (2, "a", _ts(0)), (2, "b", _ts(4)), (2, "c", _ts(11)),
    ]
    got = _run(spark, rows, within_seconds=600)
    assert got == {1: ("a", 2), 2: ("b", 2), 3: ("c", 1)}


def test_funnel_validation(spark):
    df = spark.createDataFrame([(1, "a", _ts(0))], "user_id long, event_type string, ts timestamp")
    with pytest.raises(ValueError, match="at least 2"):
        funnel(df, "user_id", "event_type", "ts", ["a"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(df, "user_id", "event_type", "ts", ["a", "a"])


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_funnel_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof: exact values, driver-safe types, both
    local scales; every step strictly shrinks on the fixture."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import FUNNEL_ORACLE, q_funnel

    sdf = q_funnel(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == ["int", "string", "bigint"]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    rel = con.sql(FUNNEL_ORACLE)
    assert all(
        str(t) in {"INTEGER", "VARCHAR", "BIGINT"} for t in rel.types
    ), [str(t) for t in rel.types]
    drows = sorted(tuple(r) for r in con.execute(FUNNEL_ORACLE).fetchall())
    con.close()
    counts = [r[2] for r in srows]
    assert len(counts) == 3 and counts[0] > counts[1] > counts[2] > 0
    assert srows == drows
