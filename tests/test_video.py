"""Video operators (operators/video.py): pure-Python YUV4MPEG2 C420
decode (REAL in-sandbox — no codec library), typed meta, per-frame
perceptual hashes through the image DCT, and clip-level near-dup by
frame-hash voting through the shared banded hamming join."""

from __future__ import annotations

import numpy as np
import pytest

from chess_lakehouse_spark.operators.multimodal import phash_reference
from chess_lakehouse_spark.operators.video import (
    decode_y4m_builtin,
    encode_y4m,
    video_frame_phash,
    video_meta,
    video_near_pairs,
)


def _frame(seed: int, size: int = 32):
    """Low-frequency content (8x8 blocks upsampled) — the regime pHash
    is built for."""
    rng = np.random.RandomState(seed)
    small = rng.randint(0, 256, size=(8, 8), dtype=np.uint8)
    return np.repeat(np.repeat(small, size // 8, axis=0), size // 8, axis=1)


def _clip(seeds, size: int = 32, fps=(25, 1)) -> bytes:
    return encode_y4m([_frame(s, size) for s in seeds], *fps)


def test_y4m_roundtrip_luma_and_header():
    frames = [_frame(1), _frame(2), _frame(3)]
    w, h, fn, fd, back = decode_y4m_builtin(encode_y4m(frames, 30, 1))
    assert (w, h, fn, fd) == (32, 32, 30, 1)
    assert len(back) == 3
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


def test_y4m_decode_rejects_garbage_odd_dims_and_truncation():
    assert decode_y4m_builtin(b"\x00\x01 not video") is None
    assert decode_y4m_builtin(b"YUV4MPEG2 W32 H32 F25:1 C444\nFRAME\n") is None
    good = encode_y4m([_frame(1)])
    assert decode_y4m_builtin(good[:-10]) is None  # truncated frame body
    with pytest.raises(ValueError, match="even"):
        encode_y4m([np.zeros((31, 32), dtype=np.uint8)])
    with pytest.raises(ValueError, match="one size"):
        encode_y4m([_frame(1, 32), _frame(2, 16)])


def test_video_meta_auto_and_real(spark):
    rows = [
        (1, _clip([1, 2, 3, 4], fps=(30, 1))),
        (2, b"not video"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in video_meta(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (32, 32)
    assert got[1]["n_frames"] == 4 and got[1]["fps_num"] == 30
    assert got[1]["duration_ms"] == pytest.approx(4 * 1000.0 / 30)
    assert got[2]["width"] is None and got[2]["n_bytes"] == 9
    with pytest.raises(Exception, match="y4m"):
        video_meta(df, codec="real").collect()
    with pytest.raises(ValueError, match="codec"):
        video_meta(df, codec="fake")


def test_video_frame_phash_matches_reference_and_stride(spark):
    seeds = [1, 2, 3, 4, 5]
    df = spark.createDataFrame(
        [(1, _clip(seeds)), (2, b"junk")], "doc_id long, payload binary"
    )
    got = {
        (r["doc_id"], r["frame_idx"]): r["frame_phash"]
        for r in video_frame_phash(df).collect()
    }
    assert len(got) == 5  # undecodable doc 2 yields no rows
    for i, s in enumerate(seeds):
        assert got[(1, i)] == phash_reference(_frame(s)), i
    strided = video_frame_phash(df, frame_stride=2).collect()
    assert sorted(r["frame_idx"] for r in strided) == [0, 2, 4]
    with pytest.raises(ValueError, match="frame_stride"):
        video_frame_phash(df, frame_stride=0)


def test_video_near_pairs_rescale_and_framerate_twins(spark):
    """A 2x-upscaled re-encode matches every frame (sim 1.0); a
    half-frame-rate cut still reaches sim 1.0 by containment of its
    shorter side; unrelated clips produce no pair."""
    seeds = [10, 11, 12, 13]
    rows = [
        (1, _clip(seeds, size=32)),
        (2, _clip(seeds, size=64)),        # 2x upscale of every frame
        (3, _clip(seeds[::2], size=32)),   # half the frames (rate cut)
        (4, _clip([20, 21, 22, 23])),      # unrelated
        (5, b"junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in video_near_pairs(df, max_hamming=6, min_sim=0.9).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) in pairs and pairs[(1, 3)] == pytest.approx(1.0)
    assert all(4 not in p and 5 not in p for p in pairs)


def test_checked_frame_id_guards_packing_range(spark):
    """The composite frame id assumes 0 <= doc_id < LONG_MAX div STRIDE
    and 0 <= frame_idx < STRIDE; out-of-range inputs must raise at
    execution time, never silently collide or mis-decompose."""
    from chess_lakehouse_spark.operators.video import (
        FRAME_ID_STRIDE,
        _FID_MAX_DOC_ID,
        checked_frame_id,
    )

    ok = spark.createDataFrame(
        [(0, 0), (_FID_MAX_DOC_ID - 1, FRAME_ID_STRIDE - 1)],
        "doc_id long, frame_idx int",
    )
    got = [
        r.fid
        for r in ok.select(
            checked_frame_id("doc_id", "frame_idx").alias("fid")
        ).collect()
    ]
    assert got == [0, (_FID_MAX_DOC_ID - 1) * FRAME_ID_STRIDE + FRAME_ID_STRIDE - 1]

    for doc, idx in [(-1, 0), (_FID_MAX_DOC_ID, 0), (0, -1), (0, FRAME_ID_STRIDE)]:
        bad = spark.createDataFrame([(doc, idx)], "doc_id long, frame_idx long")
        with pytest.raises(Exception, match="checked_frame_id"):
            bad.select(
                checked_frame_id("doc_id", "frame_idx").alias("fid")
            ).collect()

    # the guard is live inside the near-pairs chain: a negative clip id
    # fails loudly instead of corrupting pair detection
    df = spark.createDataFrame(
        [(-7, _clip([1, 2])), (1, _clip([1, 2]))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="checked_frame_id"):
        video_near_pairs(df, max_hamming=6, min_sim=0.5).collect()


def test_video_near_pairs_min_sim_filters_partial_overlap(spark):
    """Clips sharing 1 of 4 frames score 0.25 — present at min_sim 0.2,
    filtered at 0.5."""
    rows = [
        (1, _clip([30, 31, 32, 33])),
        (2, _clip([30, 41, 42, 43])),  # one shared frame
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    low = {
        (r["id_a"], r["id_b"]): (r["n_matched"], r["sim"])
        for r in video_near_pairs(df, max_hamming=6, min_sim=0.2).collect()
    }
    assert low[(1, 2)][0] == 1 and low[(1, 2)][1] == pytest.approx(0.25)
    assert video_near_pairs(df, max_hamming=6, min_sim=0.5).count() == 0


def test_video_dedup_keeps_canonical_and_undecodable(spark):
    from chess_lakehouse_spark.operators.video import video_dedup

    seeds = [50, 51, 52, 53]
    df = spark.createDataFrame(
        [
            (1, _clip(seeds, size=32)),
            (2, _clip(seeds, size=64)),   # upscale twin
            (3, _clip([60, 61, 62, 63])),
            (4, b"junk"),
        ],
        "doc_id long, payload binary",
    )
    kept = video_dedup(df, max_hamming=6, min_sim=0.9)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]
    assert kept.columns == ["doc_id", "payload"]


def test_pipeline_cli_video_dedup_stage(spark, tmp_path, capsys):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    seeds = [70, 71, 72, 73]
    src = tmp_path / "vids"
    spark.createDataFrame(
        [
            (10, _clip(seeds, size=32)),
            (11, _clip(seeds, size=64)),
            (12, _clip([80, 81, 82, 83])),
        ],
        "doc_id long, payload binary",
    ).write.parquet(str(src))
    out = tmp_path / "kept"
    pipeline_cli.main([
        "video-dedup", "--inParquet", str(src), "--outDir", str(out),
        "--minSim", "0.9",
    ])
    got = spark.read.parquet(str(out))
    assert sorted(r["doc_id"] for r in got.collect()) == [10, 12]
    assert "kept=2" in capsys.readouterr().out
