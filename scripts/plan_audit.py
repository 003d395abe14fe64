"""Physical-plan audit over the whole query suite.

Prints one row per query with the operator counts that matter at 100 TB —
scans, exchanges, join strategies, windows — and flags the two
categorically bad shapes (CartesianProduct, per-row Python in a hot path
via BatchEvalPython). The machine-enforced subset of this lives in
tests/test_plans.py; this script is the human-readable sweep.

Run:  python scripts/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from chess_lakehouse_spark.session import get_spark  # noqa: E402

OPS = (
    ("scan", r"^\(\d+\) Scan parquet"),
    ("exch", r"^\(\d+\) Exchange"),
    ("bhj", r"^\(\d+\) BroadcastHashJoin"),
    ("smj", r"^\(\d+\) SortMergeJoin"),
    ("bnlj", r"^\(\d+\) BroadcastNestedLoopJoin"),
    ("win", r"^\(\d+\) Window"),
    ("sort", r"^\(\d+\) Sort\b"),
    ("pyudf", r"^\(\d+\) (BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas)"),
)
FATAL = ("CartesianProduct",)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="plan_audit")
    header = f"{'query':28s} " + " ".join(f"{k:>5s}" for k, _ in OPS) + "  flags"
    print(header)
    print("-" * len(header))
    flagged = []
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ERROR: {exc}")
            flagged.append(name)
            continue
        counts = {
            k: len(re.findall(pat, plan, flags=re.MULTILINE)) for k, pat in OPS
        }
        flags = [f for f in FATAL if f in plan]
        if flags:
            flagged.append(name)
        print(
            f"{name:28s} "
            + " ".join(f"{counts[k]:5d}" for k, _ in OPS)
            + ("  " + ",".join(flags) if flags else "")
        )
    if flagged:
        print(f"\nFLAGGED: {flagged}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
