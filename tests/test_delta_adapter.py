"""Delta adapter: env-gated like the multimodal codecs and hf:// source —
the delta-backed branch needs the delta-spark package (absent here), so
these tests pin the parts that must be right regardless: the MERGE
condition builder and the actionable gate error."""

from __future__ import annotations

import importlib.util

import pytest

from chess_lakehouse_spark.operators.delta_adapter import (
    delta_available,
    delete_rows_delta,
    merge_condition,
    merge_overwrite_delta,
)

HAS_DELTA = importlib.util.find_spec("delta") is not None


def test_merge_condition_is_null_safe_conjunction():
    assert merge_condition(["a"]) == "t.`a` <=> u.`a`"
    assert (
        merge_condition(["a", "b c"], left="x", right="y")
        == "x.`a` <=> y.`a` AND x.`b c` <=> y.`b c`"
    )
    with pytest.raises(ValueError, match="key_cols"):
        merge_condition([])


@pytest.mark.skipif(HAS_DELTA, reason="delta installed: gate not reachable")
def test_gate_raises_actionable_error(spark):
    df = spark.range(1).selectExpr("id AS k")
    with pytest.raises(ModuleNotFoundError, match="delta-spark"):
        merge_overwrite_delta(spark, "/tmp/nonexistent", df, ["k"])
    with pytest.raises(ModuleNotFoundError, match="publish.py"):
        delete_rows_delta(spark, "/tmp/nonexistent", df, ["k"])
    assert delta_available() is False


@pytest.mark.skipif(not HAS_DELTA, reason="delta-spark not installed")
def test_delta_merge_roundtrip(spark, tmp_path):
    """Real Delta branch — runs wherever delta-spark + jars exist."""
    path = str(tmp_path / "dl")
    spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v").write.format(
        "delta"
    ).save(path)
    updates = spark.range(8, 12).selectExpr("id AS k", "id * 100 AS v")
    merge_overwrite_delta(spark, path, updates, ["k"])
    got = {r.k: r.v for r in spark.read.format("delta").load(path).collect()}
    assert got[8] == 800 and got[11] == 1100 and got[0] == 0 and len(got) == 12
    delete_rows_delta(spark, path, spark.range(0, 2).selectExpr("id AS k"), ["k"])
    assert spark.read.format("delta").load(path).count() == 10
