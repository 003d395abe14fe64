"""Core-ratio scale demonstration (r16, VERDICT item 8).

The driver's sf0.1 bench cannot show that any operator parallelizes: at
that scale nearly every query sits at the ~0.5 s per-query fixed floor
(scheduling + codegen + driver round-trips), so its 8-vs-32-core ratios
are all ~1. This probe builds a x-factor scaled corpus (documents and
embeddings x-copied with distinct ids and per-copy word tags — the
scaling_probe.py discipline: corpus growth, never duplicate collapse),
then runs the heaviest suite queries THROUGH bench.py (same harness,
same noop-sink methodology) at 8 and at 32 cores in fresh processes,
and writes the side record ``SCALING_r16.json``.

Additions-only: the driver's bench contract, inputs and one-line JSON
are untouched; the scaled tables live under a temp dir that is never
read by any declared query (bench.py only sees it through the explicit
``SPARK_GRAFT_SF_DIR`` this probe sets), and nothing persists results.

Usage: python scripts/core_ratio_probe.py [sf_dir] [factor] [--ops a,b]
Defaults: /root/testdata/sf0.1, factor 8, the 5 heaviest r15 queries.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HEAVY = [
    "dedup_ngram_jaccard",
    "bm25_batch",
    "tfidf_cosine",
    "dedup_semdedup",
    "knn_pq_adc",
]

#: Tables the heavy family reads (plus lineitem for bench.py's warmup).
SCALED_TABLES = {"documents": ("doc_id", "text"), "embeddings": ("vec_id", None)}


def build_scaled_dir(sf_dir: str, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="core_ratio_build")
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(sf_dir):
        if not name.endswith(".parquet"):
            continue
        table = name[: -len(".parquet")]
        src = os.path.join(sf_dir, name)
        dst = os.path.join(out_dir, name)
        if table not in SCALED_TABLES:
            # verbatim copy: dimension tables / warmup input
            if os.path.isdir(src):
                shutil.copytree(src, dst, dirs_exist_ok=True)
            else:
                shutil.copy(src, dst)
            continue
        id_col, text_col = SCALED_TABLES[table]
        base = spark.read.parquet(src)
        copies = []
        for i in range(factor):
            c = base.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000))
            if text_col is not None and i > 0:
                # per-copy word tags: copy i's vocabulary is disjoint from
                # copy j's, so near-dup/pair structure grows LINEARLY with
                # the factor (corpus growth), never quadratically
                # (duplicate collapse) — scaling_probe.py's rationale.
                c = c.withColumn(
                    text_col,
                    F.regexp_replace(F.col(text_col), r"(\S+)", f"$1v{i}q"),
                )
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(dst)
    spark.stop()


def run_bench(scaled_dir: str, cpus: int, ops: list[str], reps: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR=scaled_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_ONLY=",".join(ops),
        SPARK_GRAFT_BENCH_REPS=str(reps),
    )
    subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(REPO / "BENCH_SUBSET.json") as fh:
        return json.load(fh)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    ops = HEAVY
    if "--ops" in args:
        i = args.index("--ops")
        ops = args[i + 1].split(",")
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    factor = int(args[1]) if len(args) > 1 else 8
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    out_dir = tempfile.mkdtemp(prefix=f"core_ratio_x{factor}_")
    try:
        print(f"building x{factor} scaled dir at {out_dir} ...", flush=True)
        build_scaled_dir(sf_dir, factor, out_dir)
        record: dict = {
            "factor": factor,
            "base_sf_dir": sf_dir,
            "reps": reps,
            "queries": {},
        }
        for cpus in (32, 8):
            print(f"bench at local[{cpus}] ...", flush=True)
            res = run_bench(out_dir, cpus, ops, reps)
            record[f"loadavg_{cpus}"] = [
                res.get("loadavg_start"),
                res.get("loadavg_end"),
            ]
            for q, sec in res["queries"].items():
                record["queries"].setdefault(q, {})[f"sec_{cpus}"] = sec
        for q, row in record["queries"].items():
            if row.get("sec_8") and row.get("sec_32"):
                row["core_ratio"] = round(row["sec_8"] / row["sec_32"], 2)
        with open(REPO / "SCALING_r16.json", "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
        print(json.dumps(record, sort_keys=True))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
