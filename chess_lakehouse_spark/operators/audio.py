"""Audio-column operators: opaque binary payloads, REAL in-sandbox decode.

The audio sibling of ``operators/multimodal.py`` (the brief's multimodal
north star): payloads ride as ``binary`` columns; decode / meta /
feature-extract / resample / fingerprint run as Arrow-batched
``mapInPandas`` stages. RIFF/WAVE PCM16 is decodable with a pure-Python
chunk walker — no codec library — so unlike the image path there is no
PIL gate at all: ``codec='real'`` runs for every valid WAV in this
container, and only genuinely non-WAV payloads need the ``auto``
NULL-and-survive contract.

The fingerprint is the Haitsma & Kalker (2002) robust-hash idea reduced
to one band: sign of ENERGY DIFFERENCES between consecutive windows —
invariant under amplitude scaling (uniform gain scales every window
energy, preserving comparisons) and stable under resampling (windows are
equal TIME slices, not fixed sample counts). 64 fingerprint bits feed
the SAME banded hamming machinery as text SimHash and image pHash
(``operators/dedup.py: hamming_near_pairs`` / ``hamming_join``), so
audio near-dup inherits the measured band_bits cost/recall knob
(SCALE.md) instead of growing a third join implementation.

Scale notes: every stage is narrow (per-row / per-batch, no shuffle);
payload bytes stay inside Arrow record batches end-to-end. Executor
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of corpus size; the only shuffle in audio near-dup is the
shared banded equi-join.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_META_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate int, n_channels int, "
    "n_frames long, duration_ms double"
)
AUDIO_FEATURES_SCHEMA = "doc_id long, rms double, zcr double, peak double"
AUDIO_FRAME_SCHEMA = "doc_id long, frame_idx int, energy double, zcr double"
AUDIO_RESAMPLE_SCHEMA = "doc_id long, payload binary, sample_rate int"
AUDIO_FP_SCHEMA = "doc_id long, afp long"

#: Fingerprint geometry: FP_BITS energy-difference bits over FP_BITS + 1
#: equal time windows.
FP_BITS = 64


def encode_wav_pcm16(samples, sample_rate: int) -> bytes:
    """Serialize int16 samples (1-D mono or (n_frames, n_channels)) as a
    canonical RIFF/WAVE PCM16 file — the exact inverse of
    :func:`decode_wav_builtin` (round-trip pinned in tests)."""
    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    data = arr.tobytes()
    n_ch = int(arr.shape[1])
    byte_rate = sample_rate * n_ch * 2
    header = (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")          # PCM
        + n_ch.to_bytes(2, "little")
        + int(sample_rate).to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little")   # block align
        + (16).to_bytes(2, "little")         # bits per sample
        + b"data"
        + len(data).to_bytes(4, "little")
    )
    return header + data


def decode_wav_builtin(payload: bytes):
    """Parse one RIFF/WAVE PCM16 payload with a pure-Python chunk walker
    (word-aligned chunks, ``fmt `` + ``data`` required, format code 1 /
    16-bit only). Returns ``(sample_rate, n_channels, samples)`` with
    ``samples`` an int16 array of shape (n_frames, n_channels), or
    ``None`` when the payload is not a decodable PCM16 WAV — the same
    soft contract as the image codecs."""
    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if pos + 8 + size > len(payload):
            # truncated or size-corrupted chunk: reject the payload rather
            # than silently computing features/fingerprints over a partial
            # slice (mirrors the WARC parser's truncation check)
            return None
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16 or n_ch < 1 or rate < 1:
        return None
    n = len(data) // (2 * n_ch)
    samples = np.frombuffer(data[: n * 2 * n_ch], dtype="<i2").reshape(n, n_ch)
    return rate, n_ch, samples


def _mono(samples) -> "object":
    """Channel-mean mono mix in float64 (deterministic: fixed-order mean
    over a bounded channel count)."""
    return samples.astype("float64").mean(axis=1)


def audio_meta(payloads: DataFrame, codec: str = "auto") -> DataFrame:
    """Typed audio metadata via mapInPandas: (doc_id, n_bytes,
    sample_rate, n_channels, n_frames, duration_ms). ``auto`` yields
    NULL audio fields for non-WAV payloads; ``real`` raises inside the
    batch — and since the decoder is built in, ``real`` works for every
    valid PCM16 WAV in any environment."""
    if codec not in ("auto", "real"):
        raise ValueError(f"unknown codec mode: {codec!r}")

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, chans, frames, durs = [], [], [], []
            for b in pdf["payload"]:
                dec = decode_wav_builtin(b)
                if dec is None:
                    if codec == "real":
                        raise ValueError("audio_meta(codec='real'): payload is not PCM16 WAV")
                    rates.append(None); chans.append(None)
                    frames.append(None); durs.append(None)
                else:
                    rate, n_ch, samples = dec
                    rates.append(rate); chans.append(n_ch)
                    frames.append(samples.shape[0])
                    durs.append(samples.shape[0] * 1000.0 / rate)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_channels": pd.array(chans, dtype="Int32"),
                    "n_frames": pd.array(frames, dtype="Int64"),
                    "duration_ms": pd.array(durs, dtype="float64"),
                }
            )

    return payloads.mapInPandas(_meta, schema=AUDIO_META_SCHEMA)


def audio_features(payloads: DataFrame) -> DataFrame:
    """Per-clip scalar features over the mono mix: RMS (normalized to
    [0, 1] full scale), zero-crossing RATE (sign changes / frames), peak
    (max |sample| / 32768). Undecodable payloads yield NULL features and
    always survive downstream filters that gate on them explicitly."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rms, zcr, peak = [], [], []
            for b in pdf["payload"]:
                dec = decode_wav_builtin(b)
                if dec is None or dec[2].shape[0] == 0:
                    rms.append(None); zcr.append(None); peak.append(None)
                    continue
                mono = _mono(dec[2])
                rms.append(float(np.sqrt(np.mean(mono * mono))) / 32768.0)
                if mono.shape[0] > 1:
                    s = np.sign(mono)
                    s[s == 0] = 1.0
                    zcr.append(float(np.mean(s[1:] != s[:-1])))
                else:
                    zcr.append(0.0)
                peak.append(float(np.max(np.abs(mono))) / 32768.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "rms": pd.array(rms, dtype="float64"),
                    "zcr": pd.array(zcr, dtype="float64"),
                    "peak": pd.array(peak, dtype="float64"),
                }
            )

    return payloads.mapInPandas(_feat, schema=AUDIO_FEATURES_SCHEMA)


def audio_frame_features(payloads: DataFrame, frame_len: int = 1024) -> DataFrame:
    """Windowed features (1 → N rows per clip — the UDTF-shaped stage,
    like the video ``frame_sample``): per ``frame_len``-sample window of
    the mono mix, mean energy and zero-crossing rate. Undecodable
    payloads yield no rows."""
    if frame_len < 1:
        raise ValueError(f"frame_len must be >= 1, got {frame_len}")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "energy": [], "zcr": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                dec = decode_wav_builtin(b)
                if dec is None:
                    continue
                mono = _mono(dec[2])
                for i in range(0, mono.shape[0], frame_len):
                    w = mono[i : i + frame_len]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // frame_len)
                    out["energy"].append(float(np.mean(w * w)) / (32768.0 * 32768.0))
                    if w.shape[0] > 1:
                        s = np.sign(w)
                        s[s == 0] = 1.0
                        out["zcr"].append(float(np.mean(s[1:] != s[:-1])))
                    else:
                        out["zcr"].append(0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "energy": pd.Series(out["energy"], dtype="float64"),
                    "zcr": pd.Series(out["zcr"], dtype="float64"),
                }
            )

    return payloads.mapInPandas(_frames, schema=AUDIO_FRAME_SCHEMA)


def audio_resample(payloads: DataFrame, target_rate: int) -> DataFrame:
    """Nearest-neighbor resample to ``target_rate`` and re-encode as
    canonical PCM16 WAV — the deterministic integer-indexing policy of
    the image ``_resize_nearest`` (index ``floor(i * rate / target)``),
    bit-reproducible anywhere. Undecodable payloads pass through
    UNCHANGED with a NULL sample_rate (the survive contract). Returns
    (doc_id, payload, sample_rate)."""
    if target_rate < 1:
        raise ValueError(f"target_rate must be >= 1, got {target_rate}")

    def _res(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            outs, rates = [], []
            for b in pdf["payload"]:
                dec = decode_wav_builtin(b)
                if dec is None:
                    outs.append(b)
                    rates.append(None)
                    continue
                rate, _n_ch, samples = dec
                n_out = max(int(samples.shape[0] * target_rate // rate), 1)
                idx = (np.arange(n_out, dtype="int64") * rate) // target_rate
                idx = np.minimum(idx, samples.shape[0] - 1)
                outs.append(encode_wav_pcm16(samples[idx], target_rate))
                rates.append(target_rate)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pd.Series(outs, dtype="object"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                }
            )

    return payloads.mapInPandas(_res, schema=AUDIO_RESAMPLE_SCHEMA)


def audio_fingerprint_reference(samples, n_bits: int = FP_BITS) -> int | None:
    """Energy-difference fingerprint of one decoded clip — the pure
    function the Spark stage and tests share (one implementation, no
    twin to drift; the image :func:`~chess_lakehouse_spark.operators.
    multimodal.phash_reference` pattern). Haitsma & Kalker (2002)
    reduced to one band: split the mono mix into ``n_bits + 1`` equal
    TIME windows, bit i = energy(window i+1) > energy(window i). Signed
    64-bit return, matching the Spark ``long`` the banded join shifts.
    Invariant under uniform gain; stable under resampling (equal time
    slices). Returns None for clips shorter than ``n_bits + 1`` frames
    (no stable window energies)."""
    import numpy as np

    mono = _mono(samples)
    n = mono.shape[0]
    if n < n_bits + 1:
        return None
    bounds = (np.arange(n_bits + 2, dtype="int64") * n) // (n_bits + 1)
    e = np.add.reduceat(mono * mono, bounds[:-1])
    bits = 0
    for i in range(n_bits):
        if float(e[i + 1]) > float(e[i]):
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def audio_fingerprint(payloads: DataFrame) -> DataFrame:
    """64-bit audio fingerprint via mapInPandas: (doc_id, afp), NULL for
    undecodable or too-short clips. Feed into the shared banded hamming
    join (:func:`audio_near_pairs`) for near-duplicate detection —
    re-encodes, gain changes, and resamples land within a few bits."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for b in pdf["payload"]:
                dec = decode_wav_builtin(b)
                fps.append(None if dec is None else audio_fingerprint_reference(dec[2]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "afp": pd.array(fps, dtype="Int64"),
                }
            )

    return payloads.mapInPandas(_fp, schema=AUDIO_FP_SCHEMA)


def audio_near_pairs(
    payloads: DataFrame,
    max_hamming: int = 6,
    band_bits: int = 8,
) -> DataFrame:
    """Audio near-duplicate pairs: fingerprints into the SAME banded
    hamming equi-join as text SimHash and image pHash
    (``operators/dedup.py: hamming_near_pairs``) — pigeonhole-complete
    for ``max_hamming < 64 / band_bits``, pruned-then-verified beyond,
    ``band_bits=16`` the measured 100 TB knob (SCALE.md). Undecodable /
    too-short clips (NULL afp) produce no pairs. Returns
    (id_a, id_b, hamming)."""
    from chess_lakehouse_spark.operators.dedup import hamming_near_pairs

    sig = audio_fingerprint(payloads).where(F.col("afp").isNotNull())
    return hamming_near_pairs(
        sig, "doc_id", "afp", n_bits=FP_BITS,
        max_hamming=max_hamming, band_bits=band_bits,
    )


def audio_dedup(
    payloads: DataFrame,
    max_hamming: int = 6,
    band_bits: int = 8,
) -> DataFrame:
    """End-to-end audio near-deduplication — the audio instance of the
    image :func:`~chess_lakehouse_spark.operators.multimodal.phash_dedup`
    composition: :func:`audio_near_pairs` → connected components → keep
    the min-``doc_id`` canonical per cluster via a LEFT ANTI join on the
    bounded loser set. Undecodable / too-short clips produce no pairs
    and always survive. Returns surviving rows, all columns intact."""
    from chess_lakehouse_spark.operators.graph import connected_components

    pairs = audio_near_pairs(payloads, max_hamming=max_hamming, band_bits=band_bits)
    comps = connected_components(pairs)
    losers = comps.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return payloads.join(losers, "doc_id", "left_anti")
