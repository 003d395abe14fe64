"""Time-series gap fill (operators/relational.py:gapfill_series):
planted-hole LOCF semantics, leading-gap NULLs, off-grid rejection, and
the staged gating candidate's two-scale oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.relational import gapfill_series


def test_gapfill_locf_and_markers(spark):
    """Series A: observed at 0, 20, 30 with step 10 — bucket 10 is
    generated and carries 0's value; series B's single point spans no
    grid. Observed rows keep their own values and is_filled=False."""
    rows = [("A", 0, 5), ("A", 20, 7), ("A", 30, 9), ("B", 100, 1)]
    df = spark.createDataFrame(rows, "g string, bk long, v long")
    got = {
        (r.g, r.bk): (r.v, r.is_filled)
        for r in gapfill_series(df, "g", "bk", ["v"], 10).collect()
    }
    assert got == {
        ("A", 0): (5, False),
        ("A", 10): (5, True),     # generated, LOCF from bucket 0
        ("A", 20): (7, False),
        ("A", 30): (9, False),
        ("B", 100): (1, False),
    }


def test_gapfill_multi_value_and_leading_null(spark):
    """A NULL observed value stays NULL until a later observation fills
    forward past it; two value columns fill independently."""
    rows = [("A", 0, None, 1.5), ("A", 30, 4, None)]
    df = spark.createDataFrame(rows, "g string, bk long, x long, y double")
    got = {
        r.bk: (r.x, r.y, r.is_filled)
        for r in gapfill_series(df, "g", "bk", ["x", "y"], 10).collect()
    }
    assert got == {
        0: (None, 1.5, False),    # x has nothing to carry yet
        10: (None, 1.5, True),
        20: (None, 1.5, True),
        30: (4, 1.5, False),      # y carries through the gap
    }


def test_gapfill_rejects_off_grid_null_and_bad_step(spark):
    df = spark.createDataFrame([("A", 7, 1)], "g string, bk long, v long")
    with pytest.raises(ValueError, match="not a multiple"):
        gapfill_series(df, "g", "bk", ["v"], 10)
    # a NULL bucket must RAISE, not silently vanish at the grid join
    dfn = spark.createDataFrame(
        [("A", 10, 1), ("A", None, 2)], "g string, bk long, v long"
    )
    with pytest.raises(ValueError, match="NULL or not"):
        gapfill_series(dfn, "g", "bk", ["v"], 10)
    with pytest.raises(ValueError, match="positive"):
        gapfill_series(df, "g", "bk", ["v"], 0)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_gapfill_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof: exact values, driver-safe types, both
    local scales; generated and observed rows both present."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import GAPFILL_ORACLE, q_gapfill

    sdf = q_gapfill(spark, sf_dir)
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
    rel = con.sql(GAPFILL_ORACLE)
    assert all(
        str(t) in {"VARCHAR", "BIGINT", "BOOLEAN"} for t in rel.types
    ), [str(t) for t in rel.types]
    drows = sorted(tuple(r) for r in con.execute(GAPFILL_ORACLE).fetchall())
    con.close()
    filled = [r for r in srows if r[3]]
    assert 0 < len(filled) < len(srows)  # markers split both ways
    assert srows == drows
