"""Staging tests for the `exact_quantiles` r11 candidate
(suite/llm.py:q_exact_quantiles / EXACT_QUANTILES_ORACLE): two-scale
exact parity against the suite-defined DuckDB oracle, driver-safe output
types, and the distributed-rank plan shape. The operator's semantics
(sorted-pick at ceil(q*N), ties, by-group form, validation) are pinned
in tests/test_llm_ops.py."""

from __future__ import annotations

import duckdb
import pytest

from chess_lakehouse_spark.suite.llm import (
    EXACT_QUANTILE_PPMS,
    EXACT_QUANTILES_ORACLE,
    q_exact_quantiles,
)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_exact_quantiles_candidate_matches_oracle_two_scales(spark, sf_dir):
    sdf = q_exact_quantiles(spark, sf_dir)
    assert dict(sdf.dtypes) == {"q_ppm": "bigint", "value": "double"}
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    res = con.execute(EXACT_QUANTILES_ORACLE)
    dtypes = [d[1] for d in res.description]
    drows = sorted(tuple(r) for r in res.fetchall())
    con.close()
    assert dtypes == ["NUMBER", "NUMBER"]
    assert len(srows) == len(EXACT_QUANTILE_PPMS)
    assert srows == drows


def test_exact_quantiles_candidate_plan_is_distributed(spark):
    plan = (
        q_exact_quantiles(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ntile" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the range exchange runs inside the eager localCheckpoint job; the
    # derived plan reads the checkpointed snapshot
    assert "ExistingRDD" in plan or "LogicalRDD" in plan


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_group_quantiles_candidate_matches_oracle_two_scales(spark, sf_dir):
    from chess_lakehouse_spark.suite.llm import (
        GROUP_QUANTILE_PPMS,
        GROUP_QUANTILES_ORACLE,
        q_group_quantiles,
    )

    sdf = q_group_quantiles(spark, sf_dir)
    assert dict(sdf.dtypes) == {
        "l_returnflag": "string",
        "l_linestatus": "string",
        "q_ppm": "bigint",
        "value": "double",
    }
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    drows = sorted(
        tuple(r) for r in con.execute(GROUP_QUANTILES_ORACLE).fetchall()
    )
    con.close()
    n_groups = len({(r[0], r[1]) for r in srows})
    assert len(srows) == n_groups * len(GROUP_QUANTILE_PPMS)
    assert srows == drows
