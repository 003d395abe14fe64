"""Multimodal-column queries: binary payload plumbing over mapInPandas
(north-star extension, SURVEY.md §7 step 8). The decode is a deterministic
fake (no codec libs in the container — see operators/multimodal.py), which
lets the DuckDB oracle gate the full Spark path: binary column → Arrow
batch → pandas transform → typed rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chess_lakehouse_spark.catalog import load_table
from chess_lakehouse_spark.operators.multimodal import (
    FRAME_STRIDE,
    MAX_FRAMES,
    attach_payload,
    decode_meta,
    frame_sample,
)
from chess_lakehouse_spark.session import apply_runtime_conf


def q_mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → typed metadata (mapInPandas, Arrow-batched)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return decode_meta(attach_payload(docs, "doc_id", "text"))


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → N sampled frames (1→many mapInPandas, UDTF-shaped)."""
    apply_runtime_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_payload(docs, "doc_id", "text"))


QUERIES = {
    "mm_decode_meta": q_mm_decode_meta,
    "mm_frame_sample": q_mm_frame_sample,
}

ORACLES = {
    "mm_decode_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(octet_length(encode(text)) % 640 AS INT) AS width,
               CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
               md5(text) AS checksum
        FROM documents
    """,
    "mm_frame_sample": f"""
        WITH m AS (
          SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS checksum
          FROM documents
        )
        SELECT doc_id,
               CAST(u AS INT) AS frame_idx,
               CAST(u * {FRAME_STRIDE} AS BIGINT) AS frame_off,
               md5(concat(checksum, ':', CAST(u AS VARCHAR))) AS frame_sig
        FROM (
          SELECT doc_id, checksum,
                 unnest(range(0, least(n_bytes // {FRAME_STRIDE} + 1, {MAX_FRAMES}))) AS u
          FROM m
        )
    """,
}
