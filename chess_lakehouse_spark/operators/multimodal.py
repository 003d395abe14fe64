"""Multimodal-column operators: opaque binary payloads + typed metadata.

North-star extension (SURVEY.md §7 step 8). Image/audio/video payloads are
carried as ``binary`` columns; decode / feature-extract / frame-sample run
as Arrow-batched ``mapInPandas`` stages — the Spark-side plumbing (schema,
batch shape, partitioning) is real and oracle-tested. The actual codec call
is STUBBED: the container ships no image/audio libraries, so ``decode_meta``
/ ``frame_sample`` compute a deterministic fake from the payload bytes, and
``decode_image_real`` raises ``NotImplementedError`` unless PIL appears.

Scale notes: every stage here is narrow (per-row / per-batch, no shuffle).
Payload bytes stay inside Arrow record batches end-to-end — the JVM↔Python
transfer is columnar, never per-row pickling. Partition sizing for 100 TB of
binaries is controlled upstream by ``spark.sql.files.maxPartitionBytes``;
each mapInPandas batch holds ``spark.sql.execution.arrow.maxRecordsPerBatch``
rows, which bounds executor-Python memory regardless of corpus size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Deterministic fake-decode parameters (mirrored in the oracle SQL).
FRAME_STRIDE = 128
MAX_FRAMES = 8

DECODE_META_SCHEMA = "doc_id long, n_bytes long, width int, height int, checksum string"
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_off long, frame_sig string"


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize an opaque binary payload column (utf-8 bytes of the text —
    the fixture stand-in for image/audio bytes)."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload"))


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real image decode — STUB. The Spark plumbing around it is real; only
    the codec is absent from this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL in container
        raise NotImplementedError(
            "image decode requires PIL, not available in this environment; "
            "the pipeline uses the deterministic fake decode instead"
        ) from exc
    raise NotImplementedError("real decode path is intentionally stubbed")  # pragma: no cover


def decode_meta(payloads: DataFrame) -> DataFrame:
    """Per-payload typed metadata via mapInPandas (Arrow batches).

    Fake decode: width/height derived arithmetically from the byte length,
    checksum = md5 of the payload bytes — deterministic, so the DuckDB
    oracle can compute the identical values from the source text.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": (n_bytes % 640).astype("int32"),
                    "height": ((n_bytes * 7) % 480).astype("int32"),
                    "checksum": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return payloads.mapInPandas(_decode, schema=DECODE_META_SCHEMA)


def frame_sample(payloads: DataFrame) -> DataFrame:
    """Frame sampling (1 → N rows per payload) via mapInPandas — the
    UDTF-shaped stage: a "video" of n bytes yields
    ``min(n // FRAME_STRIDE + 1, MAX_FRAMES)`` frames at fixed byte offsets,
    each tagged with a deterministic per-frame signature."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_sig": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                checksum = hashlib.md5(payload).hexdigest()
                n_frames = min(len(payload) // FRAME_STRIDE + 1, MAX_FRAMES)
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_off"].append(i * FRAME_STRIDE)
                    out["frame_sig"].append(
                        hashlib.md5(f"{checksum}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_off": pd.Series(out["frame_off"], dtype="int64"),
                    "frame_sig": pd.Series(out["frame_sig"], dtype="object"),
                }
            )

    return payloads.mapInPandas(_sample, schema=FRAME_SAMPLE_SCHEMA)
