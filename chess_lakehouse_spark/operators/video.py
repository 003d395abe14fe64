"""Video-column operators: opaque binary payloads, REAL in-sandbox decode.

The video sibling of ``operators/multimodal.py`` (images) and
``operators/audio.py`` (audio): YUV4MPEG2 (``.y4m``) is the one video
container decodable with pure Python — a plain-text stream header
(``YUV4MPEG2 W<w> H<h> F<num>:<den> ... C420``) followed by
``FRAME\\n`` + raw planar YUV per frame — so, as with PCM16 WAV, the
real-decode path runs in a codec-less container with no library gate.
Compressed formats (mp4/webm) stay behind the same soft contract as
non-PPM images: NULL-and-survive in ``auto`` mode, loud failure in
``real``.

Video near-dup composes the other two modalities' machinery instead of
growing new algorithms: each sampled frame's LUMA plane goes through the
image pHash (``operators/multimodal.py: phash_reference`` — one DCT
implementation for stills and frames), frame hashes meet in the SAME
banded hamming join (``operators/dedup.py: hamming_near_pairs``), and
clip similarity is the matched-frame fraction — re-encodes, rescales,
and frame-rate changes of a clip keep most frame hashes within a few
bits.

Scale notes: decode/sample/hash are narrow Arrow-batched stages; the
only shuffle is the shared banded equi-join on frame hashes, whose
band_bits cost/recall knob is measured in SCALE.md. Executor-Python
memory is bounded by the Arrow batch size times the largest single
payload — at 100 TB, clips land as individual payloads (one row each),
exactly like the image path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VIDEO_META_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, "
    "fps_num int, fps_den int, duration_ms double"
)
FRAME_PHASH_SCHEMA = "doc_id long, frame_idx int, frame_phash long"

#: Frame-id packing for the banded join: composite id =
#: doc_id * FRAME_ID_STRIDE + frame_idx. Bounds sampled frames per clip.
FRAME_ID_STRIDE = 1_000_000

#: Largest doc_id the packing can carry without overflowing a signed
#: 64-bit composite (exclusive bound).
_FID_MAX_DOC_ID = (2**63 - 1) // FRAME_ID_STRIDE


def checked_frame_id(doc_id, frame_idx):
    """Composite frame id ``doc_id * FRAME_ID_STRIDE + frame_idx`` with a
    LOUD per-row range guard: the packing assumes ``0 <= doc_id <
    LONG_MAX div FRAME_ID_STRIDE`` and ``0 <= frame_idx <
    FRAME_ID_STRIDE``. Out-of-range inputs would silently collide or
    mis-decompose (DIV/% on negatives), corrupting clip-pair detection —
    so they raise at execution time instead (Spark ``raise_error`` in the
    taken CASE branch: zero cost on valid rows, no driver-side action
    needed to enforce it)."""
    d, i = F.col(doc_id) if isinstance(doc_id, str) else doc_id, (
        F.col(frame_idx) if isinstance(frame_idx, str) else frame_idx
    )
    bad = (
        (d < 0)
        | (d >= F.lit(_FID_MAX_DOC_ID))
        | (i < 0)
        | (i >= F.lit(FRAME_ID_STRIDE))
    )
    return F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit("checked_frame_id: out of range (doc_id="),
                d.cast("string"),
                F.lit(", frame_idx="),
                i.cast("string"),
                F.lit(
                    f"); packing needs 0 <= doc_id < {_FID_MAX_DOC_ID} "
                    f"and 0 <= frame_idx < {FRAME_ID_STRIDE}"
                ),
            )
        ).cast("long"),
    ).otherwise(d.cast("long") * FRAME_ID_STRIDE + i)


def encode_y4m(frames, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """Serialize grayscale frames (iterable of (h, w) uint8 arrays, even
    dims) as a canonical YUV4MPEG2 C420 stream — luma = the frame,
    chroma planes neutral (128). The exact inverse of
    :func:`decode_y4m_builtin` on the luma (round-trip pinned in tests).
    """
    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_y4m: at least one frame required")
    h, w = frames[0].shape
    if h % 2 or w % 2:
        raise ValueError(f"encode_y4m: C420 needs even dims, got {w}x{h}")
    out = [f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C420\n".encode()]
    uv = bytes([128]) * ((h // 2) * (w // 2))
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("encode_y4m: all frames must share one size")
        out.append(b"FRAME\n" + f.tobytes() + uv + uv)
    return b"".join(out)


def decode_y4m_builtin(payload: bytes):
    """Parse one YUV4MPEG2 C420 payload with pure Python: returns
    ``(width, height, fps_num, fps_den, luma_frames)`` where
    ``luma_frames`` is a list of (h, w) uint8 arrays (chroma is skipped —
    every downstream stage here operates on luma), or ``None`` when the
    payload is not a decodable C420 y4m — the same soft contract as the
    image/audio builtins."""
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    fps_num, fps_den = 25, 1
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F") and ":" in t:
            a, b = t[1:].split(":", 1)
            fps_num, fps_den = int(a), int(b)
        elif t.startswith("C") and t not in ("C420", "C420jpeg", "C420mpeg2"):
            return None  # only 4:2:0 subsampling is supported
    if not w or not h or w % 2 or h % 2 or fps_num < 1 or fps_den < 1:
        return None
    y_size = w * h
    frame_size = y_size + 2 * ((w // 2) * (h // 2))
    pos, frames = nl + 1, []
    while pos < len(payload):
        nl2 = payload.find(b"\n", pos)
        if nl2 < 0 or not payload[pos:nl2].startswith(b"FRAME"):
            return None
        body = payload[nl2 + 1 : nl2 + 1 + frame_size]
        if len(body) < frame_size:
            return None
        frames.append(
            np.frombuffer(body[:y_size], dtype=np.uint8).reshape(h, w).copy()
        )
        pos = nl2 + 1 + frame_size
    if not frames:
        return None
    return w, h, fps_num, fps_den, frames


def video_meta(payloads: DataFrame, codec: str = "auto") -> DataFrame:
    """Typed video metadata via mapInPandas: (doc_id, n_bytes, width,
    height, n_frames, fps_num, fps_den, duration_ms). ``auto`` yields
    NULL video fields for non-y4m payloads; ``real`` raises inside the
    batch — and since the decoder is built in, ``real`` works for every
    valid C420 y4m in any environment."""
    if codec not in ("auto", "real"):
        raise ValueError(f"unknown codec mode: {codec!r}")

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "width": [], "height": [], "n_frames": [],
                "fps_num": [], "fps_den": [], "duration_ms": [],
            }
            for b in pdf["payload"]:
                dec = decode_y4m_builtin(b)
                if dec is None:
                    if codec == "real":
                        raise ValueError(
                            "video_meta(codec='real'): payload is not C420 y4m"
                        )
                    for k in cols:
                        cols[k].append(None)
                else:
                    w, h, fn, fd, frames = dec
                    cols["width"].append(w)
                    cols["height"].append(h)
                    cols["n_frames"].append(len(frames))
                    cols["fps_num"].append(fn)
                    cols["fps_den"].append(fd)
                    cols["duration_ms"].append(len(frames) * 1000.0 * fd / fn)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.array(cols["width"], dtype="Int32"),
                    "height": pd.array(cols["height"], dtype="Int32"),
                    "n_frames": pd.array(cols["n_frames"], dtype="Int32"),
                    "fps_num": pd.array(cols["fps_num"], dtype="Int32"),
                    "fps_den": pd.array(cols["fps_den"], dtype="Int32"),
                    "duration_ms": pd.array(cols["duration_ms"], dtype="float64"),
                }
            )

    return payloads.mapInPandas(_meta, schema=VIDEO_META_SCHEMA)


def video_frame_phash(
    payloads: DataFrame, frame_stride: int = 1, codec: str = "auto"
) -> DataFrame:
    """Per-sampled-frame perceptual hash (1 → N rows per clip — the
    real-codec upgrade of the fake ``frame_sample``): every
    ``frame_stride``-th luma plane through the image
    :func:`~chess_lakehouse_spark.operators.multimodal.phash_reference`
    (one DCT implementation for stills and frames — cited there).
    Undecodable payloads yield no rows in ``auto`` and raise in
    ``real``. Returns (doc_id, frame_idx, frame_phash)."""
    from chess_lakehouse_spark.operators.multimodal import phash_reference

    if codec not in ("auto", "real"):
        raise ValueError(f"unknown codec mode: {codec!r}")
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_phash": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                dec = decode_y4m_builtin(b)
                if dec is None:
                    if codec == "real":
                        raise ValueError(
                            "video_frame_phash(codec='real'): payload is not C420 y4m"
                        )
                    continue
                frames = dec[4]
                for i in range(0, len(frames), frame_stride):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_phash"].append(phash_reference(frames[i]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_phash": pd.Series(out["frame_phash"], dtype="int64"),
                }
            )

    return payloads.mapInPandas(_hash, schema=FRAME_PHASH_SCHEMA)


def video_near_pairs(
    payloads: DataFrame,
    max_hamming: int = 6,
    min_sim: float = 0.5,
    frame_stride: int = 1,
    band_bits: int = 8,
    codec: str = "auto",
    frames: DataFrame | None = None,
) -> DataFrame:
    """Clip-level near-duplicate pairs by frame-hash voting: sampled
    frame pHashes meet in the shared banded hamming join
    (:func:`~chess_lakehouse_spark.operators.dedup.hamming_near_pairs`
    on composite ``doc_id * FRAME_ID_STRIDE + frame_idx`` ids — the
    stride dominates, so the join's id ordering IS clip ordering),
    same-clip frame matches are dropped, and a clip pair survives when
    the MAX CONTAINMENT — distinct matched sampled frames of either
    side over that side's sampled-frame count — reaches ``min_sim``
    (containment, not Jaccard, so a frame-rate-halved twin whose every
    frame matches still scores 1.0). Re-encodes and rescales keep most
    frame hashes near; unrelated clips match almost none. Never
    all-pairs: candidates exist only where frame bands collide; the
    per-pair aggregation is Spark's Expand-based two-distinct groupBy
    (3x the LSH-pruned candidate rows through a partial-aggregated
    exchange — verified in the physical plan; no cartesian, no
    broadcast-nested-loop anywhere in the chain). Returns
    (id_a, id_b, n_matched, sim) with id_a < id_b. ``frames`` optionally
    supplies a precomputed :func:`video_frame_phash` result (e.g. a
    persisted one the streaming loop also stages) so the Arrow hash
    stage runs once.
    """
    from chess_lakehouse_spark.operators.dedup import hamming_near_pairs

    S = FRAME_ID_STRIDE
    fr = (
        frames
        if frames is not None
        else video_frame_phash(payloads, frame_stride=frame_stride, codec=codec)
    )
    n_sampled = fr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sampled"))
    fid = fr.select(
        checked_frame_id("doc_id", "frame_idx").alias("fid"),
        "frame_phash",
    )
    fpairs = hamming_near_pairs(
        fid, "fid", "frame_phash", n_bits=64,
        max_hamming=max_hamming, band_bits=band_bits,
    )
    clip = (
        fpairs.select(
            F.expr(f"id_a DIV {S}").alias("clip_a"),
            F.expr(f"id_b DIV {S}").alias("clip_b"),
            (F.col("id_a") % S).alias("fa"),
            (F.col("id_b") % S).alias("fb"),
        )
        .where(F.col("clip_a") != F.col("clip_b"))
        .groupBy("clip_a", "clip_b")
        .agg(
            F.countDistinct("fa").alias("ma"),
            F.countDistinct("fb").alias("mb"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )
    return (
        clip.join(
            n_sampled.select(
                F.col("doc_id").alias("clip_a"), F.col("n_sampled").alias("na")
            ),
            "clip_a",
        )
        .join(
            n_sampled.select(
                F.col("doc_id").alias("clip_b"), F.col("n_sampled").alias("nb")
            ),
            "clip_b",
        )
        .select(
            F.col("clip_a").alias("id_a"),
            F.col("clip_b").alias("id_b"),
            "n_matched",
            F.greatest(
                F.col("ma") / F.col("na"), F.col("mb") / F.col("nb")
            ).alias("sim"),
        )
        .where(F.col("sim") >= min_sim)
    )


def video_dedup(
    payloads: DataFrame,
    max_hamming: int = 6,
    min_sim: float = 0.5,
    frame_stride: int = 1,
    band_bits: int = 8,
) -> DataFrame:
    """End-to-end video near-deduplication — the clip instance of the
    image :func:`~chess_lakehouse_spark.operators.multimodal.phash_dedup`
    composition: :func:`video_near_pairs` → connected components → keep
    the min-``doc_id`` canonical per cluster via a LEFT ANTI join on the
    bounded loser set. Undecodable payloads produce no pairs and always
    survive. Returns surviving rows, all columns intact."""
    from chess_lakehouse_spark.operators.graph import connected_components

    pairs = video_near_pairs(
        payloads, max_hamming=max_hamming, min_sim=min_sim,
        frame_stride=frame_stride, band_bits=band_bits,
    )
    comps = connected_components(pairs)
    losers = comps.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return payloads.join(losers, "doc_id", "left_anti")
