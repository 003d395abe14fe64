"""Audio operators (operators/audio.py): pure-Python RIFF/WAVE PCM16
decode (REAL in-sandbox — no codec library), meta / features / windowed
features / nearest-neighbor resample / energy-difference fingerprint,
and audio near-dup through the shared banded hamming join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.audio import (
    audio_features,
    audio_fingerprint,
    audio_fingerprint_reference,
    audio_frame_features,
    audio_meta,
    audio_near_pairs,
    audio_resample,
    decode_wav_builtin,
    encode_wav_pcm16,
)


def _sine(freq: float, rate: int = 8000, secs: float = 0.5, amp: float = 0.5):
    t = np.arange(int(rate * secs), dtype="float64") / rate
    return (np.sin(2 * np.pi * freq * t) * amp * 32767).astype("int16")


def _chirpy(seed: int, rate: int = 8000, secs: float = 0.5):
    """Deterministic multi-tone clip with per-seed envelope — distinct
    seeds produce far-apart energy profiles."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(rate * secs), dtype="float64") / rate
    f1, f2 = rng.uniform(100, 900, 2)
    env = 0.2 + 0.8 * np.abs(np.sin(2 * np.pi * rng.uniform(1, 4) * t))
    x = env * (np.sin(2 * np.pi * f1 * t) + 0.5 * np.sin(2 * np.pi * f2 * t)) / 1.5
    return (x * 0.6 * 32767).astype("int16")


def test_wav_roundtrip_mono_and_stereo():
    mono = _sine(440)
    rate, n_ch, back = decode_wav_builtin(encode_wav_pcm16(mono, 8000))
    assert (rate, n_ch) == (8000, 1)
    assert np.array_equal(back[:, 0], mono)

    stereo = np.stack([_sine(440), _sine(220)], axis=1)
    rate, n_ch, back = decode_wav_builtin(encode_wav_pcm16(stereo, 44100))
    assert (rate, n_ch) == (44100, 2)
    assert np.array_equal(back, stereo)


def test_decode_rejects_non_wav_and_non_pcm16():
    assert decode_wav_builtin(b"not audio at all") is None
    assert decode_wav_builtin(b"RIFF\x00\x00\x00\x00WAVE") is None
    # valid container, wrong format code (3 = float) must be rejected
    wav = bytearray(encode_wav_pcm16(_sine(440), 8000))
    wav[20] = 3
    assert decode_wav_builtin(bytes(wav)) is None


def test_decode_rejects_truncated_or_size_corrupted_chunks():
    """A chunk whose declared size overruns the remaining payload means a
    truncated delivery or corrupted header: the decoder must reject the
    payload (None) rather than silently compute features over a partial
    data slice — partial audio would fingerprint differently from its
    intact twin and mis-pair in dedup."""
    wav = encode_wav_pcm16(_sine(440), 8000)
    # cut the payload mid-data: declared data size now exceeds remainder
    assert decode_wav_builtin(wav[: len(wav) - 100]) is None
    # corrupt the data chunk's declared size upward (offset 40 in the
    # canonical 44-byte header layout encode_wav_pcm16 emits)
    bad = bytearray(wav)
    bad[40:44] = (len(wav)).to_bytes(4, "little")
    assert decode_wav_builtin(bytes(bad)) is None
    # intact payload still decodes
    assert decode_wav_builtin(wav) is not None


def test_decode_skips_extra_chunks():
    """Chunk walker must tolerate a LIST chunk (odd-sized, word-aligned)
    before fmt/data — real WAV files carry metadata chunks."""
    wav = encode_wav_pcm16(_sine(300), 8000)
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"  # pad
    patched = wav[:12] + extra + wav[12:]
    patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
    rate, n_ch, samples = decode_wav_builtin(patched)
    assert (rate, n_ch) == (8000, 1) and samples.shape[0] == 4000


def test_audio_meta_auto_and_real(spark):
    rows = [
        (1, bytes(encode_wav_pcm16(_sine(440, rate=8000, secs=0.25), 8000))),
        (2, b"not audio"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_meta(df).collect()}
    assert got[1]["sample_rate"] == 8000
    assert got[1]["n_channels"] == 1
    assert got[1]["n_frames"] == 2000
    assert got[1]["duration_ms"] == pytest.approx(250.0)
    assert got[2]["sample_rate"] is None and got[2]["n_bytes"] == 9
    with pytest.raises(Exception, match="PCM16"):
        audio_meta(df, codec="real").collect()
    with pytest.raises(ValueError, match="codec"):
        audio_meta(df, codec="fake")


def test_audio_features_scalar_and_windowed(spark):
    loud = _sine(440, amp=0.8)
    quiet = _sine(440, amp=0.1)
    df = spark.createDataFrame(
        [
            (1, bytes(encode_wav_pcm16(loud, 8000))),
            (2, bytes(encode_wav_pcm16(quiet, 8000))),
            (3, b"junk"),
        ],
        "doc_id long, payload binary",
    )
    feats = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert feats[1]["rms"] > feats[2]["rms"] > 0
    assert feats[1]["peak"] == pytest.approx(0.8, abs=0.01)
    # a 440 Hz tone at 8 kHz crosses zero ~2*440 times/sec = 0.11/frame
    assert feats[1]["zcr"] == pytest.approx(0.11, abs=0.02)
    assert feats[3]["rms"] is None

    frames = audio_frame_features(df, frame_len=1000).collect()
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 4  # 4000 samples / 1000
    assert 3 not in by_doc      # undecodable yields no rows
    assert all(f["energy"] > 0 for f in by_doc[1])
    with pytest.raises(ValueError, match="frame_len"):
        audio_frame_features(df, frame_len=0)


def test_audio_resample_halves_frames_and_roundtrips(spark):
    clip = _chirpy(1)
    df = spark.createDataFrame(
        [(1, bytes(encode_wav_pcm16(clip, 8000))), (2, b"junk")],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in audio_resample(df, 4000).collect()}
    rate, n_ch, samples = decode_wav_builtin(bytes(out[1]["payload"]))
    assert (rate, n_ch) == (4000, 1)
    assert samples.shape[0] == clip.shape[0] // 2
    # nearest-neighbor: every output sample is an input sample
    assert np.array_equal(samples[:, 0], clip[(np.arange(samples.shape[0]) * 2)])
    assert out[1]["sample_rate"] == 4000
    # undecodable passes through unchanged
    assert bytes(out[2]["payload"]) == b"junk" and out[2]["sample_rate"] is None
    with pytest.raises(ValueError, match="target_rate"):
        audio_resample(df, 0)


def test_fingerprint_invariances():
    clip = _chirpy(5)
    fp = audio_fingerprint_reference(clip[:, None])
    # uniform gain: energy comparisons preserved exactly
    half = (clip.astype("float64") * 0.5).astype("int16")
    assert audio_fingerprint_reference(half[:, None]) == fp
    # resample to half rate: equal TIME windows -> few bits move
    ds = clip[::2]
    fp_ds = audio_fingerprint_reference(ds[:, None])
    ham = bin((fp ^ fp_ds) & ((1 << 64) - 1)).count("1")
    assert ham <= 6
    # different content is far away
    fp_other = audio_fingerprint_reference(_chirpy(6)[:, None])
    assert bin((fp ^ fp_other) & ((1 << 64) - 1)).count("1") > 10
    # too short for 65 windows -> None
    assert audio_fingerprint_reference(clip[:64][:, None]) is None


def test_audio_near_pairs_finds_gain_twin_only(spark):
    base = _chirpy(9)
    twin = (base.astype("float64") * 0.7).astype("int16")
    rows = [
        (1, bytes(encode_wav_pcm16(base, 8000))),
        (2, bytes(encode_wav_pcm16(twin, 8000))),
        (3, bytes(encode_wav_pcm16(_chirpy(10), 8000))),
        (4, b"junk"),
        (5, bytes(encode_wav_pcm16(_sine(440)[:50], 8000))),  # too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert fps[4] is None and fps[5] is None
    assert fps[1] == audio_fingerprint_reference(
        decode_wav_builtin(bytes(encode_wav_pcm16(base, 8000)))[2]
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_pairs(df, max_hamming=6).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] <= 2


def test_audio_dedup_keeps_canonical_and_undecodable(spark):
    base = _chirpy(15)
    twin = (base.astype("float64") * 0.6).astype("int16")
    df = spark.createDataFrame(
        [
            (1, bytes(encode_wav_pcm16(base, 8000))),
            (2, bytes(encode_wav_pcm16(twin, 8000))),
            (3, bytes(encode_wav_pcm16(_chirpy(16), 8000))),
            (4, b"junk"),
        ],
        "doc_id long, payload binary",
    )
    from chess_lakehouse_spark.operators.audio import audio_dedup

    kept = audio_dedup(df, max_hamming=6)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]
    assert kept.columns == ["doc_id", "payload"]


def test_pipeline_cli_audio_dedup_stage(spark, tmp_path, capsys):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    base = _chirpy(21)
    twin = (base.astype("float64") * 0.5).astype("int16")
    src = tmp_path / "clips"
    spark.createDataFrame(
        [
            (10, bytes(encode_wav_pcm16(base, 8000))),
            (11, bytes(encode_wav_pcm16(twin, 8000))),
            (12, bytes(encode_wav_pcm16(_chirpy(22), 8000))),
        ],
        "clip_id long, clip_bytes binary",
    ).write.parquet(str(src))
    out = tmp_path / "kept"
    pipeline_cli.main([
        "audio-dedup", "--inParquet", str(src), "--outDir", str(out),
        "--idCol", "clip_id", "--payloadCol", "clip_bytes",
    ])
    got = spark.read.parquet(str(out))
    assert sorted(r["clip_id"] for r in got.collect()) == [10, 12]
    assert got.columns == ["clip_id", "clip_bytes"]
    assert "kept=2" in capsys.readouterr().out
