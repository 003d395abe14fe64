"""Lake-maintenance scaling probe: cost must track AFFECTED partitions,
not lake size.

SCALE.md states proportionality *contracts* for the mutation/maintenance
layer (`operators/publish.py`): merge_overwrite / delete_rows /
update_skipping_manifest touch O(affected partitions), while
compact_partitions / recluster_lake / write_skipping_manifest are
full-lake jobs (linear by design — they rewrite or scan every file).
This probe measures both claims: it builds x1/x2/x4/x8 Hive lakes
(partition COUNT and row count grow with the factor; per-partition size
stays fixed), then times a FIXED 2-partition mutation set against each
lake — those curves must stay ~flat as the lake grows 8x — and the
full-rewrite jobs, whose wall may grow ~linearly but must not bend
superlinear.

Usage: python scripts/lake_probe.py [sf_dir] [factors...]
Prints one JSON line per (op, factor) plus a summary table; exits 1 if a
flat-contract op's x_max/x1 ratio exceeds FLAT_RATIO_MAX (the regression
guard — same role as scaling_probe.py's boilerplate-bomb case).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F

#: Hive partitions per unit factor (x8 -> 128 partitions).
PARTS_PER_X = 16
#: Regression guard: a "cost ∝ affected partitions" op growing past this
#: ratio while the lake grows 8x has lost its proportionality contract.
FLAT_RATIO_MAX = 3.0
FLAT_OPS = ("merge_overwrite_2parts", "update_manifest_2parts", "delete_rows_2parts")


def _build_lake(spark, src, factor, lake_dir):
    """x-factor copies of the documents table, Hive-partitioned by `part`
    (PARTS_PER_X * factor partitions, fixed rows per partition)."""
    base = spark.read.parquet(src).select("doc_id", "text", "source")
    copies = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        for i in range(factor)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    n_parts = PARTS_PER_X * factor
    df = df.withColumn("part", F.pmod(F.col("doc_id"), F.lit(n_parts)).cast("string"))
    (
        df.repartition(F.col("part"))
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(lake_dir)
    )
    return n_parts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 2, 4, 8]

    from chess_lakehouse_spark.operators.publish import (
        compact_partitions,
        delete_rows,
        merge_overwrite,
        recluster_lake,
        update_skipping_manifest,
        write_skipping_manifest,
    )
    from chess_lakehouse_spark.session import get_spark

    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="lake_probe_")
    results: dict[str, dict[int, float]] = {}

    def probe(name, factor, thunk):
        t0 = time.time()
        thunk()
        dt = round(time.time() - t0, 2)
        results.setdefault(name, {})[factor] = dt
        print(json.dumps({"op": name, "factor": factor, "sec": dt}), flush=True)

    src = f"{sf_dir}/documents.parquet"
    for factor in factors:
        lake = f"{tmp}/lake_x{factor}"
        n_parts = _build_lake(spark, src, factor, lake)
        print(json.dumps({"factor": factor, "n_partitions": n_parts}), flush=True)

        # full-lake manifest build: linear contract (scans every file)
        probe(
            "manifest_full_build", factor,
            lambda: write_skipping_manifest(spark, lake, ["doc_id"]),
        )

        # FIXED work against a growing lake: exactly 100 update rows whose
        # TRUE partitions (part = doc_id % n_parts, matching _build_lake's
        # layout) are exactly {0, 1} at every factor — labeling with
        # doc_id % 2 would make merge_overwrite rewrite the wrong
        # partitions and leave duplicate doc_ids behind (r7 ADVICE).
        # doc_id = (i // 2) * n_parts + (i % 2): 50 ids per residue.
        updates = (
            spark.range(0, 100)
            .select(
                (
                    (F.col("id") - F.pmod(F.col("id"), F.lit(2))) / 2 * n_parts
                    + F.pmod(F.col("id"), F.lit(2))
                )
                .cast("long")
                .alias("doc_id")
            )
            .withColumn(
                "text", F.concat(F.lit("probe-edit "), F.col("doc_id").cast("string"))
            )
            .withColumn("source", F.lit("probe"))
            .withColumn(
                "part", F.pmod(F.col("doc_id"), F.lit(n_parts)).cast("string")
            )
        )
        probe(
            "merge_overwrite_2parts", factor,
            lambda: merge_overwrite(
                spark, lake, updates, ["doc_id"], partition_cols=["part"]
            ),
        )
        affected = updates.select("part").distinct()
        probe(
            "update_manifest_2parts", factor,
            lambda: update_skipping_manifest(
                spark, lake, ["doc_id"], ["part"], affected
            ),
        )
        keys = (
            spark.range(0, 50)
            .select((F.col("id") * n_parts + 2).alias("doc_id"))
            .withColumn("part", F.lit("2"))
        )
        probe(
            "delete_rows_2parts", factor,
            lambda: delete_rows(spark, lake, keys, ["doc_id"], partition_cols=["part"]),
        )

        # full-rewrite maintenance: linear contract (every file rewritten)
        probe(
            "compact_full", factor,
            lambda: compact_partitions(spark, lake, ["part"]),
        )
        flat = f"{tmp}/flat_x{factor}"
        spark.read.parquet(lake).write.mode("overwrite").parquet(flat)
        probe(
            "recluster_full", factor,
            lambda: recluster_lake(spark, flat, ["doc_id"], n_files=8 * factor),
        )
        shutil.rmtree(lake, ignore_errors=True)
        shutil.rmtree(flat, ignore_errors=True)

    print("\nop" + " " * 22 + "  ".join(f"x{f:<6}" for f in factors) + "xmax/x1")
    failed = []
    for name, by_f in results.items():
        row = "  ".join(f"{by_f.get(f, float('nan')):<7}" for f in factors)
        ratio = by_f.get(factors[-1], 0) / max(by_f.get(factors[0], 1e-9), 1e-9)
        print(f"{name:<24}{row}{ratio:.1f}")
        if name in FLAT_OPS and ratio > FLAT_RATIO_MAX:
            failed.append((name, round(ratio, 1)))
    if failed:
        print(f"FLAT-CONTRACT REGRESSION: {failed} exceed x{FLAT_RATIO_MAX}")
        sys.exit(1)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
