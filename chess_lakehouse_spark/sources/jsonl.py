"""JSON-Lines document corpus source/sink.

LLM training corpora ship as JSONL shards; this is the training-data twin
of the PGN table function (the reference's only file source —
``src/read-pgn.ts``). Spark-first contract:

- **Schema-pinned reads.** Schema inference is a full extra pass over the
  data before the real scan — at 100 TB that is a second 100 TB read. The
  schema is always explicit here (``DOC_SCHEMA`` default, caller-supplied
  otherwise); JSONL byte-range splits parallelize like any text source.
- **Corrupt-record quarantine, not job failure.** PERMISSIVE mode routes
  unparseable lines into a corrupt-record column; :func:`split_corrupt`
  separates clean rows from quarantined raw lines so a single mangled line
  in shard 40,000 cannot kill a day-long ingest (FAILFAST is one option
  flip away for strict pipelines).
- **Size-budgeted shard writing.** ``maxRecordsPerFile`` bounds every
  output shard without an extra repartition job — the task writer rolls
  files as the budget fills; downstream training dataloaders get
  uniformly-sized shards regardless of upstream partition skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Default document-corpus schema (mirrors the documents lake table).
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    strict: bool = False,
) -> DataFrame:
    """Read a JSONL corpus with a pinned schema.

    ``strict=False`` (default): PERMISSIVE — malformed lines land in the
    ``_corrupt_record`` column with every data field null; feed the result
    to :func:`split_corrupt`. ``strict=True``: FAILFAST — die on the first
    malformed line (CI / contract-validation runs).
    """
    schema = schema or DOC_SCHEMA
    if strict:
        return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    # text-scan + from_json instead of the native JSON source: the native
    # reader refuses plans that reference only the corrupt column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is exactly what the
    # quarantine branch does. Same parser either way (JacksonParser over
    # byte-range-split text lines), so nothing is lost at scale.
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.text(path)
        .select(
            F.from_json(
                F.col("value"),
                with_corrupt,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("r")
        )
        .select("r.*")
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_raw_lines).

    The quarantine frame keeps only the raw line — it is the re-ingest /
    alerting artifact. Both frames are narrow filters over the same scan;
    Spark reads the input once per consumed frame with the filter pushed
    into the JSON parser.
    """
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write a corpus as size-budgeted JSONL shards.

    ``maxRecordsPerFile`` makes each task roll a new file when the budget
    fills — bounded shard sizes with NO extra repartition pass. Optional
    Hive partitioning composes (e.g. by source/split) for partition-pruned
    downstream reads.
    """
    w = df.write.option("maxRecordsPerFile", max_records_per_file).mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    strict: bool = False,
) -> DataFrame:
    """CSV twin of :func:`read_jsonl` with the same contract: pinned schema
    (no inference pass), PERMISSIVE corrupt-line quarantine via
    ``_corrupt_record`` (feed to :func:`split_corrupt`), FAILFAST under
    ``strict``. Same text-scan + ``from_csv`` shape as the JSONL path (the
    native source rejects corrupt-only plans); header lines are dropped by
    exact match against the schema's column list."""
    schema = schema or DOC_SCHEMA
    if strict:
        return (
            spark.read.schema(schema)
            .option("header", header)
            .option("mode", "FAILFAST")
            .csv(path)
        )
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = spark.read.text(path)
    if header:
        header_line = ",".join(f.name for f in schema.fields)
        raw = raw.where(F.col("value") != header_line)
    return raw.select(
        F.from_csv(
            F.col("value"),
            with_corrupt.simpleString(),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r")
    ).select("r.*")
