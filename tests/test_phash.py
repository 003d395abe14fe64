"""Perceptual image hash (operators/multimodal.py: phash64 /
phash_near_pairs) and the generalized byte-banded hamming join
(operators/dedup.py: hamming_near_pairs) it shares with the text
SimHash."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from chess_lakehouse_spark.operators.dedup import (
    hamming_near_pairs,
    simhash_near_pairs,
)
from chess_lakehouse_spark.operators.multimodal import (
    decode_pixels_builtin,
    phash64,
    phash_near_pairs,
    phash_reference,
)


def _ppm_from_array(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _noise_image(w: int, h: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)


def _blocky_image(w: int, h: int, seed: int) -> np.ndarray:
    """Low-frequency content (8x8 blocks) — the regime pHash is built
    for; pure noise has no stable low-frequency structure."""
    rng = np.random.RandomState(seed)
    small = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    return np.repeat(np.repeat(small, h // 8, axis=0), w // 8, axis=1)


def test_phash_matches_reference_through_spark(spark):
    """The Spark stage must emit exactly phash_reference of the decoded
    pixels (one implementation — this pins the Arrow plumbing, not a
    reimplementation)."""
    imgs = {i: _blocky_image(32, 32, seed=i) for i in range(4)}
    df = spark.createDataFrame(
        [(i, _ppm_from_array(a)) for i, a in imgs.items()],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["phash"] for r in phash64(df).collect()}
    for i, a in imgs.items():
        decoded = decode_pixels_builtin(_ppm_from_array(a))
        assert got[i] == phash_reference(decoded), i


def test_phash_invariant_under_rescale_distinct_across_content(spark):
    """A 2x upscale of the same content hashes within a few bits (here:
    exactly equal — nearest-neighbor upscale preserves the 32x32
    downsample); unrelated content is far away."""
    base = _blocky_image(32, 32, seed=1)
    big = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)  # 64x64, same image
    other = _blocky_image(32, 32, seed=2)
    h_base = phash_reference(base)
    h_big = phash_reference(big)
    h_other = phash_reference(other)

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h_base, h_big) <= 2
    assert ham(h_base, h_other) > 10


def test_phash_undecodable_is_null_in_auto_and_raises_in_real(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG not decodable"), (2, _ppm_from_array(_noise_image(8, 8, 0)))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r["phash"] for r in phash64(df, codec="auto").collect()}
    assert rows[1] is None and rows[2] is not None
    with pytest.raises(Exception, match="PIL|NotImplemented"):
        phash64(df, codec="real").collect()
    with pytest.raises(ValueError, match="codec"):
        phash64(df, codec="fake")


def test_phash_near_pairs_finds_rescaled_twin_only(spark):
    base = _blocky_image(32, 32, seed=5)
    twin = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    rows = [
        (1, _ppm_from_array(base)),
        (2, _ppm_from_array(twin)),
        (3, _ppm_from_array(_blocky_image(32, 32, seed=6))),
        (4, b"undecodable"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(df, max_hamming=6).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] <= 2


# ---------------------------------------------------------------------------
# the generalized banded join
# ---------------------------------------------------------------------------


def _brute_pairs(hashes: dict[int, int], max_hamming: int):
    out = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                out[(a, b)] = d
    return out


def test_hamming_near_pairs_64bit_matches_brute_force(spark):
    """Random 64-bit signatures plus planted near-twins: the banded join
    must reproduce the exhaustive answer exactly for radii within the
    pigeonhole bound (max_hamming < n_bytes)."""
    rng = random.Random(9)
    hashes: dict[int, int] = {}
    for i in range(60):
        hashes[i] = rng.getrandbits(64)
    # planted twins at controlled distances
    for j, dist in [(100, 0), (101, 3), (102, 7)]:
        base = hashes[j - 100]
        flipped = base
        for bit in rng.sample(range(64), dist):
            flipped ^= 1 << bit
        hashes[j] = flipped

    def signed(v: int) -> int:
        return v - (1 << 64) if v >= 1 << 63 else v

    df = spark.createDataFrame(
        [(i, signed(h)) for i, h in hashes.items()], "id long, phash long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_pairs(df, "id", "phash", n_bits=64, max_hamming=7).collect()
    }
    want = _brute_pairs(hashes, 7)
    assert got == want
    assert {(0, 100), (1, 101), (2, 102)} <= set(want)


def test_hamming_band_bits_16_matches_brute_force_within_pigeonhole(spark):
    """16-bit bands (the 100 TB knob) keep EXACT recall for radius <=
    n_bands - 1 = 3 — same planted-twin fixture, wider bands."""
    rng = random.Random(21)
    hashes: dict[int, int] = {i: rng.getrandbits(64) for i in range(60)}
    for j, dist in [(100, 0), (101, 2), (102, 3)]:
        base = hashes[j - 100]
        for bit in rng.sample(range(64), dist):
            base ^= 1 << bit
        hashes[j] = base

    def signed(v: int) -> int:
        return v - (1 << 64) if v >= 1 << 63 else v

    df = spark.createDataFrame(
        [(i, signed(h)) for i, h in hashes.items()], "id long, phash long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_pairs(
            df, "id", "phash", n_bits=64, max_hamming=3, band_bits=16
        ).collect()
    }
    want = _brute_pairs(hashes, 3)
    assert got == want
    assert {(0, 100), (1, 101), (2, 102)} <= set(want)


def test_hamming_band_bits_must_divide(spark):
    df = spark.createDataFrame([(1, 5)], "id long, phash long")
    with pytest.raises(ValueError, match="divide"):
        hamming_near_pairs(df, "id", "phash", n_bits=64, max_hamming=3, band_bits=12)


def test_simhash_delegation_unchanged(spark):
    """simhash_near_pairs is now the 4-byte instance of the generalized
    join — same results as an explicit hamming_near_pairs call."""
    rng = random.Random(3)
    sigs = [(i, rng.getrandbits(31)) for i in range(40)]
    sigs += [(200, sigs[0][1] ^ 0b101), (201, sigs[1][1])]
    df = spark.createDataFrame(sigs, "id long, simhash long")
    a = sorted(map(tuple, simhash_near_pairs(df, "id", max_hamming=3).collect()))
    b = sorted(
        map(
            tuple,
            hamming_near_pairs(df, "id", "simhash", n_bits=32, max_hamming=3).collect(),
        )
    )
    assert a == b
    assert len(a) >= 2


# ---------------------------------------------------------------------------
# end-to-end dedup + CLI stage
# ---------------------------------------------------------------------------


def test_phash_dedup_keeps_min_id_canonical_and_survivors(spark):
    """Cluster {1,2,6} (base, 2x twin, 3x twin) keeps only id 1; the
    unrelated image, the undecodable payload, and extra columns all
    survive intact."""
    from chess_lakehouse_spark.operators.multimodal import phash_dedup

    base = _blocky_image(32, 32, seed=11)
    twin2 = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    twin3 = np.repeat(np.repeat(base, 3, axis=0), 3, axis=1)
    rows = [
        (1, _ppm_from_array(base), "a"),
        (2, _ppm_from_array(twin2), "b"),
        (3, _ppm_from_array(_blocky_image(32, 32, seed=12)), "c"),
        (4, b"undecodable", "d"),
        (6, _ppm_from_array(twin3), "e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, tag string")
    kept = phash_dedup(df, max_hamming=6)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]
    assert kept.columns == ["doc_id", "payload", "tag"]
    assert {r["doc_id"]: r["tag"] for r in kept.collect()}[1] == "a"


def test_pipeline_cli_image_dedup_stage(spark, tmp_path, capsys):
    """The image-dedup CLI reads any (id, payload) parquet — custom column
    names included — and writes the survivors."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    base = _blocky_image(32, 32, seed=31)
    twin = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    src = tmp_path / "imgs"
    spark.createDataFrame(
        [
            (10, _ppm_from_array(base)),
            (11, _ppm_from_array(twin)),
            (12, _ppm_from_array(_blocky_image(32, 32, seed=32))),
        ],
        "img_id long, img_bytes binary",
    ).write.parquet(str(src))
    out = tmp_path / "kept"
    pipeline_cli.main([
        "image-dedup", "--inParquet", str(src), "--outDir", str(out),
        "--idCol", "img_id", "--payloadCol", "img_bytes", "--maxHamming", "6",
    ])
    got = spark.read.parquet(str(out))
    assert sorted(r["img_id"] for r in got.collect()) == [10, 12]
    assert got.columns == ["img_id", "img_bytes"]
    assert "kept=2" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# r10 staging candidate: q_hamming64 vs suite oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q_hamming64_matches_suite_oracle(spark, sf_dir):
    """Driver-style gating proof for the 64-bit banded join: exact values,
    driver-safe types, both local scales — and because HAMMING64_MAX sits
    inside the pigeonhole bound, the brute-force oracle checks the banded
    join's RECALL, not just its precision."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import HAMMING64_ORACLE, q_hamming64

    sdf = q_hamming64(spark, sf_dir)
    assert [d for _, d in sdf.dtypes] == ["bigint", "bigint", "int"]
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    rel = con.sql(HAMMING64_ORACLE)
    assert all(str(t) in {"BIGINT", "INTEGER"} for t in rel.types)
    drows = sorted(tuple(r) for r in con.execute(HAMMING64_ORACLE).fetchall())
    con.close()
    assert len(srows) > 0
    assert {h for *_, h in srows} == {2, 3}  # planted twin distances
    assert srows == drows
