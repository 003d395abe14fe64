"""Data-clustering layout operators: range-clustered and Z-ordered writes.

These tests read the written Parquet FOOTERS back with pyarrow and measure
the thing the operators exist to buy — tight per-file min/max statistics —
rather than trusting the plan: a file whose [min, max] cannot satisfy a
pushed predicate is skipped by the scan (file- and row-group-level), so
footer tightness IS the 100 TB scan-pruning evidence.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.publish import (
    merge_overwrite,
    read_with_skipping,
    update_skipping_manifest,
    write_clustered,
    write_skipping_manifest,
    write_zordered,
    zorder_key,
)

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 8


def _file_ranges(out_dir: str, column: str) -> list[tuple[float, float]]:
    """Per-file (min, max) of ``column`` from the Parquet footer stats."""
    ranges = []
    for path in sorted(glob.glob(f"{out_dir}/*.parquet")):
        meta = pq.ParquetFile(path).metadata
        idx = meta.schema.names.index(column)
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        ranges.append((float(lo), float(hi)))
    return ranges


def _mean_coverage(ranges: list[tuple[float, float]]) -> float:
    """Mean fraction of the global value range each file's stats span."""
    glo = min(lo for lo, _ in ranges)
    ghi = max(hi for _, hi in ranges)
    span = ghi - glo
    return sum((hi - lo) / span for lo, hi in ranges) / len(ranges)


def _skippable(ranges: list[tuple[float, float]], point: float) -> int:
    return sum(1 for lo, hi in ranges if point < lo or point > hi)


def test_write_clustered_disjoint_ranges_and_point_skip(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = str(tmp_path / "clustered")
    write_clustered(li, out, ["l_orderkey"], n_files=N_FILES)

    ranges = _file_ranges(out, "l_orderkey")
    assert len(ranges) == N_FILES
    # range partitioning => pairwise disjoint per-file key ranges
    for (lo1, hi1), (lo2, hi2) in zip(sorted(ranges), sorted(ranges)[1:]):
        assert hi1 <= lo2
    # a point predicate can skip all but one file on footer stats alone
    mid = sorted(ranges)[N_FILES // 2][0] + 1
    assert _skippable(ranges, mid) == N_FILES - 1

    # layout change only: content identical
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0


def test_write_clustered_beats_hash_layout(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    hashed = str(tmp_path / "hashed")
    li.repartition(N_FILES).write.parquet(hashed)
    clustered = str(tmp_path / "clustered")
    write_clustered(li, clustered, ["l_orderkey"], n_files=N_FILES)

    # hash layout: every file spans ~the whole key range -> no skipping
    assert _mean_coverage(_file_ranges(hashed, "l_orderkey")) > 0.9
    assert _mean_coverage(_file_ranges(clustered, "l_orderkey")) < 1 / (N_FILES - 1)


def test_write_zordered_tightens_both_columns(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    hashed = str(tmp_path / "hashed")
    li.repartition(N_FILES).write.parquet(hashed)
    out = str(tmp_path / "zordered")
    write_zordered(li, out, ["l_partkey", "l_suppkey"], n_files=N_FILES)

    for col in ("l_partkey", "l_suppkey"):
        base = _mean_coverage(_file_ranges(hashed, col))
        z = _mean_coverage(_file_ranges(out, col))
        # every file must cover a strictly smaller slice of BOTH dimensions
        # than the hash layout; a 1-D sort would leave the other column at
        # ~full coverage, a 2-D z-curve tightens both at once.
        assert base > 0.9
        assert z < 0.75 * base, f"{col}: z={z:.3f} vs hash={base:.3f}"

    back = spark.read.parquet(out)
    assert back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0


def test_zorder_key_locality(spark):
    """Rows adjacent on the z-curve are close in both dimensions: the key
    of (bucket x, bucket y) interleaves bits, so the curve's endpoints map
    to the corners of the 2-D bucket grid."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    z = zorder_key(li, ["l_partkey", "l_suppkey"], bits_per_col=4)
    got = li.select(
        z.alias("z"), "l_partkey", "l_suppkey"
    ).orderBy("z")
    rows = got.collect()
    # z is monotone-bounded: 4 bits x 2 cols => z in [0, 2^8)
    assert all(0 <= r["z"] < 256 for r in rows)
    # the lowest z codes come from the low corner in BOTH columns, the
    # highest from the high corner
    lo, hi = rows[0], rows[-1]
    pk = [r["l_partkey"] for r in rows]
    sk = [r["l_suppkey"] for r in rows]
    assert lo["l_partkey"] <= sorted(pk)[len(pk) // 4]
    assert lo["l_suppkey"] <= sorted(sk)[len(sk) // 4]
    assert hi["l_partkey"] >= sorted(pk)[-len(pk) // 4]
    assert hi["l_suppkey"] >= sorted(sk)[-len(sk) // 4]


def test_manifest_skipping_opens_one_file(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = str(tmp_path / "lake")
    write_clustered(li, out, ["l_orderkey"], n_files=N_FILES)
    write_skipping_manifest(spark, out, ["l_orderkey"])

    ranges = sorted(_file_ranges(out, "l_orderkey"))
    lo, hi = ranges[N_FILES // 2]
    point = int((lo + hi) // 2)
    pruned = read_with_skipping(spark, out, {"l_orderkey": (point, point)})
    # the manifest prunes the scan down to the single file that can match
    assert len(pruned.inputFiles()) == 1
    expect = li.filter(f"l_orderkey = {point}")
    assert pruned.exceptAll(expect).count() == 0
    assert expect.exceptAll(pruned).count() == 0


def test_manifest_skipping_empty_range_keeps_schema(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = str(tmp_path / "lake")
    write_clustered(li, out, ["l_orderkey"], n_files=N_FILES)
    write_skipping_manifest(spark, out, ["l_orderkey"])

    empty = read_with_skipping(spark, out, {"l_orderkey": (-10, -5)})
    assert empty.count() == 0
    assert empty.schema == li.schema


def test_manifest_multi_column_conjunction(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = str(tmp_path / "lake")
    write_zordered(li, out, ["l_partkey", "l_suppkey"], n_files=N_FILES)
    write_skipping_manifest(spark, out, ["l_partkey", "l_suppkey"])

    pk = li.agg({"l_partkey": "min"}).collect()[0][0]
    sk = li.agg({"l_suppkey": "min"}).collect()[0][0]
    pruned = read_with_skipping(
        spark, out, {"l_partkey": (pk, pk + 50), "l_suppkey": (sk, sk + 3)}
    )
    # z-layout + two-sided pruning: strictly fewer files than the lake holds
    assert 0 < len(pruned.inputFiles()) < N_FILES
    expect = li.filter(
        f"l_partkey between {pk} and {pk + 50} and l_suppkey between {sk} and {sk + 3}"
    )
    assert pruned.exceptAll(expect).count() == 0
    assert expect.exceptAll(pruned).count() == 0


def test_manifest_skipping_keeps_hive_partition_columns(spark, tmp_path):
    """Leaf-file reads drop Hive partition columns unless basePath is set —
    the manifest-pruned read must preserve the full lake schema."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = str(tmp_path / "lake")
    (
        li.withColumn("flag", li.l_returnflag)
        .repartition("flag")
        .write.partitionBy("flag")
        .parquet(out)
    )
    write_skipping_manifest(spark, out, ["l_orderkey"])
    lo = li.agg({"l_orderkey": "min"}).collect()[0][0]
    pruned = read_with_skipping(spark, out, {"l_orderkey": (lo, lo)})
    assert "flag" in pruned.columns
    assert pruned.count() == li.filter(f"l_orderkey = {lo}").count()
    assert set(r["flag"] for r in pruned.select("flag").distinct().collect()) == set(
        r["l_returnflag"]
        for r in li.filter(f"l_orderkey = {lo}").select("l_returnflag").distinct().collect()
    )


def test_update_skipping_manifest_matches_full_rebuild(spark, tmp_path):
    """After a partition-scoped merge, the incremental manifest update must
    equal a from-scratch rebuild (and replace exactly the stale rows)."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    lake = str(tmp_path / "lake")
    df = li.select(
        "l_orderkey", "l_quantity", F.col("l_returnflag").alias("flag")
    )
    df.repartition("flag").write.partitionBy("flag").parquet(lake)
    write_skipping_manifest(spark, lake, ["l_orderkey"])

    # merge new rows into one partition only
    updates = (
        df.filter("flag = 'A'")
        .limit(10)
        .withColumn("l_quantity", F.lit(99.0))
    )
    merge_overwrite(
        spark, lake, updates, key_cols=["l_orderkey"], partition_cols=["flag"]
    )
    update_skipping_manifest(
        spark,
        lake,
        ["l_orderkey"],
        ["flag"],
        affected=updates.select("flag").distinct(),
    )
    incremental = spark.read.parquet(lake + "_manifest")

    rebuilt_path = str(tmp_path / "manifest_full")
    write_skipping_manifest(spark, lake, ["l_orderkey"], manifest_dir=rebuilt_path)
    rebuilt = spark.read.parquet(rebuilt_path)

    assert incremental.count() == rebuilt.count()
    assert incremental.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(incremental).count() == 0

    # and the pruned read still works against the updated manifest
    lo = df.agg({"l_orderkey": "min"}).collect()[0][0]
    pruned = read_with_skipping(spark, lake, {"l_orderkey": (lo, lo)})
    expect = spark.read.parquet(lake).filter(f"l_orderkey = {lo}")
    assert pruned.exceptAll(expect).count() == 0
    assert expect.exceptAll(pruned).count() == 0


def test_zorder_key_matches_python_reference(spark):
    """Pin the column-expression bit interleave against an independent
    Python Morton encoder over the same quantile cutpoints."""
    import bisect

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(200)
    bits = 4
    cols = ["l_partkey", "l_suppkey"]
    z = zorder_key(li, cols, bits_per_col=bits)
    rows = li.select("l_partkey", "l_suppkey", z.alias("z")).collect()

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = li.select(
        F.col(cols[0]).cast("double").alias("__q0"),
        F.col(cols[1]).cast("double").alias("__q1"),
    ).approxQuantile(["__q0", "__q1"], probs, 0.01)

    def morton(vals):
        out = 0
        for i, (v, cut) in enumerate(zip(vals, cuts)):
            bucket = bisect.bisect_right(sorted(cut), float(v))
            for b in range(bits):
                out |= ((bucket >> b) & 1) << (b * len(cols) + i)
        return out

    for r in rows:
        assert r["z"] == morton([r["l_partkey"], r["l_suppkey"]])


def test_write_partitioned_sort_cols_orders_rows_in_files(spark, tmp_path):
    """sort_cols clusters rows inside each Hive partition's files, so
    row-group min/max stats are tight within every partition."""
    from chess_lakehouse_spark.operators.publish import write_partitioned

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumn(
        "flag", F.col("l_returnflag")
    )
    out = str(tmp_path / "lake")
    write_partitioned(li, out, ("flag",), sort_cols=["l_orderkey"])
    files = glob.glob(f"{out}/flag=*/*.parquet")
    assert files
    for path in files:
        vals = pq.read_table(path, columns=["l_orderkey"])["l_orderkey"].to_pylist()
        assert vals == sorted(vals)
    back = spark.read.parquet(out)
    assert back.count() == li.count()


def test_lake_lifecycle_composition(spark, tmp_path):
    """The full lake story composed: sorted partitioned publish → manifest →
    merge + incremental refresh → partition-emptying delete + refresh →
    pruned reads stay exact → compact + full rebuild → vacuum finds nothing."""
    from chess_lakehouse_spark.operators.publish import (
        compact_partitions,
        delete_rows,
        vacuum_lake,
        write_partitioned,
    )

    lake = str(tmp_path / "lake")
    df = spark.range(0, 300).select(
        F.col("id"),
        (F.col("id") * 7 % 100).alias("val"),
        F.when(F.col("id") < 100, "A")
        .when(F.col("id") < 200, "B")
        .otherwise("C")
        .alias("p"),
    )
    write_partitioned(df, lake, ("p",), sort_cols=["id"])
    write_skipping_manifest(spark, lake, ["id"])

    # merge into p=A, refresh incrementally
    updates = spark.createDataFrame([(5, 999, "A")], "id long, val long, p string")
    merge_overwrite(spark, lake, updates, key_cols=["id"], partition_cols=["p"])
    update_skipping_manifest(
        spark, lake, ["id"], ["p"], affected=updates.select("p").distinct()
    )
    got = read_with_skipping(spark, lake, {"id": (5, 5)})
    assert [(r["id"], r["val"]) for r in got.collect()] == [(5, 999)]

    # delete ALL of p=C, refresh — the emptied partition must vanish from
    # both the lake and the manifest
    keys = spark.createDataFrame([(i, "C") for i in range(200, 300)], "id long, p string")
    delete_rows(spark, lake, keys, key_cols=["id"], partition_cols=["p"])
    update_skipping_manifest(
        spark, lake, ["id"], ["p"], affected=keys.select("p").distinct()
    )
    man = spark.read.parquet(lake + "_manifest")
    assert man.filter(F.col("file").contains("/p=C/")).count() == 0
    assert read_with_skipping(spark, lake, {"id": (250, 250)}).count() == 0
    assert spark.read.parquet(lake).count() == 200

    # compaction rewrites every file: full manifest rebuild, reads still exact
    compact_partitions(spark, lake, partition_cols=["p"])
    write_skipping_manifest(spark, lake, ["id"])
    got = read_with_skipping(spark, lake, {"id": (150, 155)})
    assert sorted(r["id"] for r in got.collect()) == list(range(150, 156))

    assert vacuum_lake(spark, lake) == []


def test_recluster_lake_reorders_in_place(spark, tmp_path):
    """recluster_lake rewrites layout only: content identical, files become
    range-disjoint, and the manifest built after makes point reads O(1)."""
    from chess_lakehouse_spark.operators.publish import recluster_lake

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    lake = str(tmp_path / "lake")
    li.repartition(N_FILES).write.parquet(lake)  # hash layout: no skipping
    assert _mean_coverage(_file_ranges(lake, "l_orderkey")) > 0.9

    recluster_lake(spark, lake, ["l_orderkey"], n_files=N_FILES)
    ranges = _file_ranges(lake, "l_orderkey")
    assert len(ranges) == N_FILES
    assert _mean_coverage(ranges) < 1 / (N_FILES - 1)
    back = spark.read.parquet(lake)
    assert back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0
    # no sidecars left behind
    assert not (tmp_path / "lake.compacting").exists()
    assert not (tmp_path / "lake.old").exists()

    # multi-column path routes through write_zordered
    recluster_lake(spark, lake, ["l_partkey", "l_suppkey"], n_files=N_FILES)
    for col in ("l_partkey", "l_suppkey"):
        assert _mean_coverage(_file_ranges(lake, col)) < 0.7
    back = spark.read.parquet(lake)
    assert back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0


def test_cluster_api_validation(spark, tmp_path):
    import pytest as _pytest

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    with _pytest.raises(ValueError, match="n_files"):
        write_clustered(li, str(tmp_path / "x"), ["l_orderkey"], n_files=0)
    with _pytest.raises(ValueError, match="non-empty"):
        write_clustered(li, str(tmp_path / "x"), [], n_files=4)
    with _pytest.raises(ValueError, match="62"):
        zorder_key(li, ["l_partkey", "l_suppkey"], bits_per_col=32)
    with _pytest.raises(ValueError, match="non-empty"):
        write_skipping_manifest(spark, str(tmp_path / "x"), [])
    with _pytest.raises(ValueError, match="non-empty"):
        read_with_skipping(spark, str(tmp_path / "x"), {})


def test_zorder_key_null_safe(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (1.0, None), (None, None), (2.0, 2.0)],
        "a double, b double",
    )
    z = zorder_key(df, ["a", "b"], bits_per_col=2)
    vals = [r[0] for r in df.select(z).collect()]
    assert all(v is not None and v >= 0 for v in vals)


def test_zorder_key_all_null_column(spark):
    """A column with no non-NULL values has no quantile cutpoints; it must
    contribute bucket 0 everywhere instead of breaking the fold."""
    df = spark.createDataFrame(
        [(None, 1.0), (None, 5.0), (None, 9.0)], "a double, b double"
    )
    z = zorder_key(df, ["a", "b"], bits_per_col=2)
    vals = sorted(r[0] for r in df.select(z).collect())
    assert all(v is not None and v >= 0 for v in vals)
    # the live column still discriminates
    assert len(set(vals)) > 1


def test_zorder_key_rejects_non_numeric_column(spark):
    """A string column casts to all-NULL doubles — previously it silently
    contributed bucket 0 on every row while the write claimed clustering
    on that dimension; now it must fail loudly."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [("x", 1.0), ("y", 2.0), ("z", 3.0)], "a string, b double"
    )
    with _pytest.raises(ValueError, match="non-numeric"):
        zorder_key(df, ["a", "b"], bits_per_col=2)


def test_vacuum_restores_lake_from_crash_window(spark, tmp_path):
    """Crash window of _swap_lake_dirs: live dir renamed aside to .old,
    replacement not yet in place — .old is the ONLY copy. vacuum_lake must
    RESTORE it (and clean the stranded .compacting), never delete it."""
    import os

    from chess_lakehouse_spark.operators.publish import vacuum_lake

    lake = str(tmp_path / "lake")
    df = spark.range(0, 50).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("p")
    )
    df.write.partitionBy("p").parquet(lake)
    # simulate the crash: live -> .old done, .compacting stranded mid-swap
    os.rename(lake, lake + ".old")
    spark.range(0, 50).write.parquet(lake + ".compacting")
    assert not os.path.exists(lake)

    removed = vacuum_lake(spark, lake)
    assert f"restored:{lake}.old" in removed
    assert lake + ".compacting" in removed
    assert os.path.exists(lake)
    assert not os.path.exists(lake + ".old")
    assert not os.path.exists(lake + ".compacting")
    back = spark.read.parquet(lake)
    assert back.count() == 50

    # normal state afterwards: nothing left to clean
    assert vacuum_lake(spark, lake) == []


def test_delete_rows_escaped_partition_values(spark, tmp_path):
    """Partition values Spark percent-escapes in directory names (':', '/')
    plus a space (not escaped): emptied-partition cleanup must find the
    on-disk directory or 'deleted' rows silently survive."""
    import os

    from chess_lakehouse_spark.operators.publish import delete_rows

    lake = str(tmp_path / "lake")
    vals = ["a:b", "a/b", "a b", "plain"]
    rows = [(i * 10 + j, v) for i, v in enumerate(vals) for j in range(3)]
    df = spark.createDataFrame(rows, "id long, src string")
    df.write.partitionBy("src").parquet(lake)
    dirs = {d for d in os.listdir(lake) if d.startswith("src=")}
    assert "src=a%3Ab" in dirs and "src=a%2Fb" in dirs and "src=a b" in dirs

    # delete ALL rows of the two escaped partitions and one of the space one
    keys = spark.createDataFrame(
        [(0, "a:b"), (1, "a:b"), (2, "a:b"), (10, "a/b"), (11, "a/b"),
         (12, "a/b"), (20, "a b")],
        "id long, src string",
    )
    delete_rows(spark, lake, keys, key_cols=["id"], partition_cols=["src"])

    dirs = {d for d in os.listdir(lake) if d.startswith("src=")}
    assert "src=a%3Ab" not in dirs and "src=a%2Fb" not in dirs
    assert "src=a b" in dirs and "src=plain" in dirs
    back = spark.read.parquet(lake)
    assert sorted(r["id"] for r in back.collect()) == [21, 22, 30, 31, 32]


def test_update_skipping_manifest_escaped_partition_values(spark, tmp_path):
    """Stale-manifest-row matching must use the writer's escaped directory
    segment; with raw values the stale rows survive and the manifest keeps
    serving files the mutation rewrote."""
    from chess_lakehouse_spark.operators.publish import delete_rows

    lake = str(tmp_path / "lake")
    rows = [(i, "s:1" if i < 20 else "s2", i) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, src string, v long")
    df.write.partitionBy("src").parquet(lake)
    write_skipping_manifest(spark, lake, ["id"])
    man_before = spark.read.parquet(lake + "_manifest")
    # input_file_name URIs carry the Hive escape percent-encoded again
    old_files = {
        r["file"]
        for r in man_before.filter(F.col("file").contains("%253A")).collect()
    }
    assert old_files

    # delete HALF the escaped partition's rows: the partition survives, is
    # rewritten, and the incremental refresh must both drop the stale rows
    # AND re-scan the escaped directory
    keys = spark.createDataFrame([(i, "s:1") for i in range(10)], "id long, src string")
    delete_rows(spark, lake, keys, key_cols=["id"], partition_cols=["src"])
    update_skipping_manifest(
        spark, lake, ["id"], ["src"], affected=keys.select("src").distinct()
    )
    man = spark.read.parquet(lake + "_manifest")
    # every pre-rewrite file of the escaped partition dropped, fresh ones in
    assert {r["file"] for r in man.collect()} & old_files == set()
    assert man.filter(F.col("file").contains("%253A")).count() > 0
    # pruned read agrees with ground truth after the refresh
    got = read_with_skipping(spark, lake, {"id": (0, 39)})
    assert sorted(r["id"] for r in got.collect()) == list(range(10, 40))
