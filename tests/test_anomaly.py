"""Exact-integer trailing z-score anomaly flags
(operators/relational.py:integer_zscore_flags): planted-spike semantics,
partial-window NULLs, algebraic equivalence with the float z-score on a
hand case, and the staged gating candidate's two-scale oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.relational import integer_zscore_flags


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g string, bk long, n long")
    out = integer_zscore_flags(df, "g", "bk", "n", **kw)
    return {(r.g, r.bk): r.is_anomaly for r in out.collect()}


def test_planted_spike_and_partial_window(spark):
    """Steady series with one spike: flags only the spike; the first
    `window` points score NULL (no full baseline yet); the point after
    the spike is judged against a window CONTAINING the spike (inflated
    variance) and stays normal."""
    rows = [("A", i, 10) for i in range(8)] + [("A", 8, 100), ("A", 9, 10)]
    got = _run(spark, rows, window=4, k2=9)
    assert got[("A", 0)] is None and got[("A", 3)] is None  # partial window
    assert got[("A", 4)] is False
    assert got[("A", 8)] is True      # the spike vs a flat baseline
    assert got[("A", 9)] is False     # baseline variance now inflated


def test_matches_float_zscore_on_nondegenerate_case(spark):
    """(w·x − s)² > k²(w·ss − s²) is algebraically |x − mean| > k·σ_pop:
    verify against the float computation on a varied window."""
    base = [3, 7, 5, 9, 6, 4, 8, 5]
    rows = [("A", i, v) for i, v in enumerate(base)] + [("A", 8, 20), ("A", 9, 6)]
    w, k2 = 8, 4
    got = _run(spark, rows, window=w, k2=k2)
    import statistics

    for probe_bk, x in ((8, 20), (9, 6)):
        win = [v for _, b, v in rows if probe_bk - w <= b <= probe_bk - 1]
        mean = statistics.fmean(win)
        var = statistics.pvariance(win)
        assert got[("A", probe_bk)] == (abs(x - mean) ** 2 > k2 * var)


def test_zero_variance_window_flags_any_deviation(spark):
    """A constant baseline has rhs = 0: any deviation flags, an equal
    value does not (strict >)."""
    rows = [("A", i, 5) for i in range(4)] + [("A", 4, 5), ("A", 5, 6)]
    got = _run(spark, rows, window=4, k2=9)
    assert got[("A", 4)] is False
    assert got[("A", 5)] is True


def test_validation(spark):
    df = spark.createDataFrame([("A", 1, 1)], "g string, bk long, n long")
    with pytest.raises(ValueError, match="window"):
        integer_zscore_flags(df, "g", "bk", "n", window=1)
    with pytest.raises(ValueError, match="k2"):
        integer_zscore_flags(df, "g", "bk", "n", k2=0)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_anomaly_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof: exact values, driver-safe types, both
    local scales; the anomaly boolean takes all three states."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import ANOMALY_ORACLE, q_anomaly

    sdf = q_anomaly(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == [
        "string", "bigint", "bigint", "boolean",
    ]
    srows = sorted(
        tuple(r) for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    rel = con.sql(ANOMALY_ORACLE)
    assert all(
        str(t) in {"VARCHAR", "BIGINT", "BOOLEAN"} for t in rel.types
    ), [str(t) for t in rel.types]
    drows = sorted(tuple(r) for r in con.execute(ANOMALY_ORACLE).fetchall())
    con.close()
    states = {r[3] for r in srows}
    assert states == {True, False, None}
    assert srows == drows
