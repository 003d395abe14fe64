#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs every suite query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of all timed queries (each materialized
with a count-style action so the full plan executes but results never
funnel through the driver). A short warmup query first absorbs JVM/codegen
startup so per-query numbers measure the engine, not session bring-up.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _loadavg() -> list[float] | None:
    """1/5/15-minute host load — recorded with every bench line so an
    inflated record is attributable to host contention at a glance (the
    r9/r10 driver records both carried undetected ~45% contention
    inflation; SCALE.md's run-order contract requires the bench to run
    FIRST on a quiet host, and this field proves whether it did)."""
    try:
        with open("/proc/loadavg") as fh:
            return [float(x) for x in fh.read().split()[:3]]
    except (OSError, ValueError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    # watchlist / re-measure mode: time only the named queries (comma
    # list). The driver never sets this; it exists for the quiet-host
    # min-of-3 re-measures SCALE.md records per round.
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    only = {q.strip() for q in only_env.split(",") if q.strip()} or None

    from chess_lakehouse_spark import suite
    from chess_lakehouse_spark.session import get_spark

    spark = get_spark(
        app_name="chess_lakehouse_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    # Warmup: touch the biggest fact table (JVM/codegen/FS caches) and run one
    # trivial pandas_udf so Python worker spin-up is paid once here, not by
    # the first UDF-bearing query.
    t0 = time.perf_counter()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s):
        return s

    spark.range(4).select(_noop(F.col("id"))).count()
    warmup_s = time.perf_counter() - t0

    load_start = _loadavg()
    timings: dict[str, float] = {}
    first_rep: dict[str, float] = {}
    failures: dict[str, str] = {}
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    for name, fn in suite.QUERIES.items():
        if only is not None and name not in only:
            continue
        best = None
        for rep_no in range(reps):
            # operators persist intermediate frames; drop them between runs so
            # one run's cache does not skew the next run's memory budget
            spark.catalog.clearCache()
            start = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                # Materialize every operator in the plan without collecting
                # rows to the driver (matches how the 100 TB deployment
                # consumes results: write/aggregate, never driver collect).
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 - report, don't abort
                failures[name] = f"{type(exc).__name__}: {exc}"[:200]
                best = None
                break
            elapsed = time.perf_counter() - start
            if rep_no == 0:
                # Audit record (additions-only, r15 verdict item 2): rep 1
                # includes any once-per-process staged-artifact build for the
                # *_staged family, so build+serve and serve-only (min) wall
                # times are BOTH auditable in BENCH_FULL.json.
                first_rep[name] = round(elapsed, 4)
            best = elapsed if best is None or elapsed < best else best
        if best is not None:
            # min over reps: wall-clock noise is one-sided, the min is the
            # least-contended measurement of the actual plan cost
            timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = None

    out = {
        "metric": "suite_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "warmup_sec": round(warmup_s, 4),
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
    }
    if failures:
        out["failures"] = failures
    # Full audit record only (stripped from the compact line below): rep-1
    # wall per query, so staged-build cost is never invisible in the record.
    out["first_rep_sec"] = {k: first_rep[k] for k in timings if k in first_rep}

    # The harness records only a bounded tail of this process's stdout
    # (observed: BENCH_r04 captured 2000 chars and failed to parse the
    # 85-query line -> "parsed": null). Keep the printed line comfortably
    # under that bound: emit the slowest queries until the line would
    # exceed the budget, roll the rest into one "other" bucket, and write
    # the COMPLETE per-query map next to this script for auditing.
    # subset runs must never clobber the full-suite audit record
    full_path = os.path.join(
        _REPO, "BENCH_FULL.json" if only is None else "BENCH_SUBSET.json"
    )
    with open(full_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)

    budget = 1800
    compact = dict(out)
    # keep the printed one-line contract unchanged: the per-query rep-1 map
    # lives in BENCH_FULL.json only
    compact.pop("first_rep_sec", None)
    if failures:
        # failure messages can be long; the compact line carries only the
        # names (full messages stay in BENCH_FULL.json)
        compact["failures"] = {"n": len(failures), "names": sorted(failures)[:10]}
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    for keep in range(len(ranked), -1, -1):
        shown = dict(ranked[:keep])
        rest = round(sum(t for _, t in ranked[keep:]), 4)
        if rest:
            shown["_other"] = rest
        compact["queries"] = shown
        if keep < len(ranked):
            compact["queries_omitted"] = len(ranked) - keep
            compact["full_timings"] = "BENCH_FULL.json"
        line = json.dumps(compact)
        if len(line) <= budget:
            break
    print(line)


if __name__ == "__main__":
    main()
