"""Per-query profiling harness (guide §1: measure first).

For each named query, in THIS process: build the plan, capture
``explain("formatted")``, then time the noop-sink materialization
(guide §1.4) with a job group so the Spark job count is attributable.
Prints one JSON line per query.

Run:  python scripts/profile_query.py [sf_dir] query [query ...]
      SPARK_GRAFT_PROFILE_REPS=N  (default 2, min taken)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from chess_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR")
    plan_tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")
    spark = get_spark(
        app_name="profile_query",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    # same warmup as bench.py so first-query numbers are comparable
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s):
        return s

    spark.range(4).select(_noop(F.col("id"))).count()

    queries = entry_mod.queries()
    sc = spark.sparkContext
    for name in names:
        fn = queries[name]
        out: dict = {"query": name}
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            out["build_s"] = round(time.perf_counter() - t0, 3)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            import re

            out["exchanges"] = len(
                re.findall(r"\(\d+\) Exchange", plan)
            )
            if plans_dir:
                Path(plans_dir).mkdir(parents=True, exist_ok=True)
                (Path(plans_dir) / f"{name}_{plan_tag}.txt").write_text(plan)
            best = None
            best_jobs = None
            for i in range(reps):
                spark.catalog.clearCache()
                group = f"prof-{name}-{i}"
                sc.setJobGroup(group, name)
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                sc.setJobGroup(None, None)
                jobs = len(sc.statusTracker().getJobIdsForGroup(group))
                if best is None or el < best:
                    best, best_jobs = el, jobs
            out["noop_s"] = round(best, 3)
            out["jobs"] = best_jobs
        except Exception as exc:  # noqa: BLE001
            out["err"] = f"{type(exc).__name__}: {exc}"[:300]
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
