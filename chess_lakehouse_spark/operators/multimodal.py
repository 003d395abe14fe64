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


def _pil_image():
    """Soft import: the PIL Image module, or None in codec-less containers."""
    try:
        from PIL import Image

        return Image
    except ImportError:  # pragma: no cover - no PIL in container
        return None


def _fake_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in dimensions, mirrored in the oracle SQL."""
    return n_bytes % 640, (n_bytes * 7) % 480


def decode_image(payload: bytes) -> tuple[int, int]:
    """(width, height) via PIL when importable, else the deterministic fake
    — the operator upgrades automatically in environments that ship codecs
    while staying runnable (and oracle-deterministic) here."""
    image_mod = _pil_image()
    if image_mod is not None:  # pragma: no cover - no PIL in container
        import io

        with image_mod.open(io.BytesIO(payload)) as im:
            return int(im.width), int(im.height)
    return _fake_dims(len(payload))


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Strict real decode: PIL or NotImplementedError — for pipelines that
    must fail loudly rather than emit fake dimensions."""
    if _pil_image() is None:
        raise NotImplementedError(
            "image decode requires PIL, not available in this environment; "
            "use decode_image (soft fallback) or codec='fake'"
        )
    return decode_image(payload)  # pragma: no cover - no PIL in container


def decode_meta(payloads: DataFrame, codec: str = "fake") -> DataFrame:
    """Per-payload typed metadata via mapInPandas (Arrow batches).

    ``codec='fake'`` (default, oracle-gated): width/height derived
    arithmetically from the byte length — deterministic, so the DuckDB
    oracle computes identical values from the source text. ``codec='auto'``:
    real PIL decode when the library is importable, fake otherwise (soft
    upgrade). ``codec='real'``: PIL or fail loudly. The Arrow plumbing —
    schema, batch shape, checksum — is identical on every path.
    """
    if codec not in ("fake", "auto", "real"):
        raise ValueError(f"unknown codec mode: {codec!r}")
    if codec == "real" and _pil_image() is None:
        raise NotImplementedError("codec='real' requires PIL in the executor environment")
    use_real = codec in ("auto", "real") and _pil_image() is not None

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            if use_real:  # pragma: no cover - no PIL in container
                dims = pdf["payload"].map(decode_image)
                width = dims.map(lambda d: d[0]).astype("int32")
                height = dims.map(lambda d: d[1]).astype("int32")
            else:
                width = (n_bytes % 640).astype("int32")
                height = ((n_bytes * 7) % 480).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": width,
                    "height": height,
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


RESIZE_SCHEMA = "doc_id long, width int, height int, resized_sig string"
FEATURE_DIM = 16
FEATURES_SCHEMA = "doc_id long, n_bytes long, features array<double>"


def resize_image(
    payloads: DataFrame, target_w: int, target_h: int, codec: str = "fake"
) -> DataFrame:
    """Resize stage via mapInPandas — same codec contract as
    :func:`decode_meta`: ``fake`` emits the target dimensions plus a
    deterministic signature binding (payload, target) — the Arrow plumbing
    (schema, batch shape, per-row transform) is the real article; ``auto``
    upgrades to a PIL thumbnail when the library exists; ``real`` demands
    it. Narrow (per-batch), no shuffle at any scale; output payload bytes
    for the real path would ride the same binary column contract as the
    input.

    Returns (doc_id, width, height, resized_sig).
    """
    if codec not in ("fake", "auto", "real"):
        raise ValueError(f"unknown codec mode: {codec!r}")
    if codec == "real" and _pil_image() is None:
        raise NotImplementedError("codec='real' requires PIL in the executor environment")
    use_real = codec in ("auto", "real") and _pil_image() is not None

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:  # pragma: no cover - no PIL in container
                import io

                Image = _pil_image()

                def sig(b: bytes) -> str:
                    img = Image.open(io.BytesIO(b))
                    img.thumbnail((target_w, target_h))
                    return hashlib.md5(img.tobytes()).hexdigest()

                sigs = pdf["payload"].map(sig)
            else:
                sigs = pdf["payload"].map(
                    lambda b: hashlib.md5(
                        hashlib.md5(b).hexdigest().encode() + f":{target_w}x{target_h}".encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "resized_sig": sigs,
                }
            )

    return payloads.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def extract_features(payloads: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction over binary payloads — NOT a stub: the feature is
    an L2-normalized ``dim``-bucket byte histogram, computable without any
    codec library (numpy.bincount per payload inside the Arrow batch) and a
    legitimate content signature for dedup/clustering of binary blobs.

    The output ``features array<double>`` column is the same shape the
    embedding operators consume, so the multimodal path composes directly
    with :func:`~chess_lakehouse_spark.operators.similarity.knn_brute_force`
    / ``semantic_dedup`` (binary near-dup via histogram cosine). Narrow,
    Arrow-batched, zero shuffle.

    Returns (doc_id, n_bytes, features).
    """
    if dim < 1 or 256 % dim != 0:
        raise ValueError(f"extract_features: dim must divide 256, got {dim}")

    import numpy as np

    bucket = 256 // dim

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr // bucket, minlength=dim).astype("float64")
                norm = float(np.sqrt((hist * hist).sum()))
                feats.append((hist / norm if norm > 0 else hist).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return payloads.mapInPandas(_extract, schema=FEATURES_SCHEMA)
