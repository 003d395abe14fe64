"""JSONL corpus source/sink: schema-pinned reads, corrupt-line quarantine,
size-budgeted shard writing."""

from __future__ import annotations

import glob
import json
import os

from chess_lakehouse_spark.sources.jsonl import (
    read_jsonl,
    split_corrupt,
    write_jsonl_shards,
)


def _write_fixture(tmp_path, lines):
    p = tmp_path / "in"
    p.mkdir()
    (p / "part-000.jsonl").write_text("\n".join(lines) + "\n")
    return str(p)


GOOD = [
    json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en", "source": "s0"})
    for i in range(5)
]


def test_read_jsonl_clean_and_quarantine(spark, tmp_path):
    src = _write_fixture(tmp_path, GOOD + ["{not valid json", GOOD[0][:-5]])
    clean, bad = split_corrupt(read_jsonl(spark, src))
    assert clean.count() == 5
    assert {r.doc_id for r in clean.collect()} == set(range(5))
    bad_lines = [r.raw_line for r in bad.collect()]
    assert len(bad_lines) == 2
    assert "{not valid json" in bad_lines


def test_read_jsonl_strict_raises(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    src = _write_fixture(tmp_path, GOOD + ["{broken"])
    with pytest.raises((PySparkException, Py4JJavaError)):
        read_jsonl(spark, src, strict=True).count()


def test_write_jsonl_shards_bounds_file_size(spark, tmp_path):
    src = _write_fixture(tmp_path, GOOD)
    clean, _ = split_corrupt(read_jsonl(spark, src))
    out = str(tmp_path / "out")
    # force everything through one task so the budget is what rolls files
    write_jsonl_shards(clean.coalesce(1), out, max_records_per_file=2)
    files = glob.glob(os.path.join(out, "*.json"))
    assert len(files) >= 3  # 5 rows / 2 per file
    back = read_jsonl(spark, out)
    clean2, bad2 = split_corrupt(back)
    assert bad2.count() == 0
    assert {r.doc_id for r in clean2.collect()} == set(range(5))


def test_write_jsonl_shards_partitioned(spark, tmp_path):
    rows = [
        json.dumps({"doc_id": i, "text": f"d{i}", "lang": "en", "source": f"s{i % 2}"})
        for i in range(6)
    ]
    src = _write_fixture(tmp_path, rows)
    clean, _ = split_corrupt(read_jsonl(spark, src))
    out = str(tmp_path / "out_part")
    write_jsonl_shards(clean, out, partition_by=("source",))
    assert os.path.isdir(os.path.join(out, "source=s0"))
    assert os.path.isdir(os.path.join(out, "source=s1"))
    back, _ = split_corrupt(read_jsonl(spark, out + "/source=s0"))
    # partition column is encoded in the path, not the rows
    assert back.drop("source").count() == 3


def test_read_csv_clean_and_quarantine(spark, tmp_path):
    from chess_lakehouse_spark.sources.jsonl import read_csv

    p = tmp_path / "csv"
    p.mkdir()
    (p / "part-000.csv").write_text(
        "doc_id,text,lang,source\n"
        "1,hello,en,s0\n"
        "2,world,en,s0\n"
        "not_a_number,broken,en,s0\n"
    )
    clean, bad = split_corrupt(read_csv(spark, str(p)))
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert bad.count() == 1


def test_write_partitioned_compression_codec(spark, tmp_path):
    import glob

    from chess_lakehouse_spark.operators.publish import write_partitioned

    df = spark.createDataFrame(
        [(1, "a", "s0"), (2, "b", "s1")], ["doc_id", "text", "source"]
    )
    out = str(tmp_path / "lake")
    write_partitioned(df, out, ("source",))
    files = glob.glob(f"{out}/source=*/*.parquet")
    assert files and all(".zstd." in f for f in files)
    assert spark.read.parquet(out).count() == 2
