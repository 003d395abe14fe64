"""Multimodal codec path selection: deterministic fake for the oracle
gate, built-in pure-Python PPM/BMP decode for codec='real' even in
codec-less containers, PIL soft-upgrade for other formats, loud failure
on strict real mode for formats neither covers."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import Row

from chess_lakehouse_spark.operators.multimodal import (
    _pil_image,
    attach_payload,
    decode_image,
    decode_image_builtin,
    decode_image_real,
    decode_meta,
    decode_pixels_builtin,
)


def _payloads(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello world")])
    return attach_payload(df, "doc_id", "text")


def _ppm(w: int, h: int, seed: int = 0) -> bytes:
    body = bytes((i * 31 + seed) % 256 for i in range(w * h * 3))
    return b"P6\n# a comment line\n%d %d\n255\n" % (w, h) + body


def _bmp(w: int, h: int, seed: int = 0) -> bytes:
    """Minimal 24-bit uncompressed bottom-up BMP."""
    row = (w * 3 + 3) // 4 * 4
    pix = bytearray()
    for y in range(h):
        r = bytes(((x + y * w) * 17 + seed) % 256 for x in range(w * 3))
        pix += r + b"\x00" * (row - len(r))
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return hdr + info + bytes(pix)


def test_decode_meta_fake_is_deterministic(spark):
    r = decode_meta(_payloads(spark)).collect()[0]
    assert (r.n_bytes, r.width, r.height) == (11, 11, 77)


def test_decode_meta_auto_falls_back_without_pil(spark):
    if _pil_image() is not None:
        pytest.skip("PIL present: fallback path not reachable")
    fake = decode_meta(_payloads(spark)).collect()
    auto = decode_meta(_payloads(spark), codec="auto").collect()
    assert fake == auto


def test_decode_meta_real_fails_loudly_on_unknown_format(spark):
    if _pil_image() is not None:
        pytest.skip("PIL present: strict mode would succeed")
    # text bytes are neither netpbm nor BMP -> per-payload loud failure
    with pytest.raises(Exception, match="PIL"):
        decode_meta(_payloads(spark), codec="real").collect()
    with pytest.raises(NotImplementedError):
        decode_image_real(b"xx")


def test_decode_meta_rejects_unknown_codec(spark):
    with pytest.raises(ValueError):
        decode_meta(_payloads(spark), codec="webp")


def test_builtin_codec_headers():
    """The pure-Python parsers read real header bytes: dims, comments,
    padding, bottom-up rows — no PIL involved."""
    assert decode_image_builtin(_ppm(12, 7)) == (12, 7)
    assert decode_image_builtin(_bmp(5, 3)) == (5, 3)
    assert decode_image_builtin(b"not an image") is None
    assert decode_image_builtin(b"P6\n12") is None  # truncated header
    assert decode_image_real(_ppm(2, 2)) == (2, 2)
    # pixel decode round-trips the raster
    arr = decode_pixels_builtin(_ppm(4, 2))
    assert arr.shape == (2, 4, 3)
    assert arr.reshape(-1).tolist() == [(i * 31) % 256 for i in range(24)]
    barr = decode_pixels_builtin(_bmp(3, 2))
    assert barr.shape == (2, 3, 3)
    # bottom-up + BGR->RGB: image top row is stored row y=1; the R channel
    # of its first pixel is that row's byte index 2 -> ((2 + 1*3) * 17)
    assert barr[0, 0, 0] == ((2 + 1 * 3) * 17) % 256


def test_decode_meta_real_runs_on_builtin_formats(spark):
    """codec='real' produces REAL dimensions in this codec-less container
    for PPM/BMP payloads — the r7 verdict's in-sandbox real branch."""
    rows = [Row(doc_id=1, payload=bytearray(_ppm(12, 7))),
            Row(doc_id=2, payload=bytearray(_bmp(5, 3)))]
    got = {
        r.doc_id: (r.width, r.height)
        for r in decode_meta(spark.createDataFrame(rows), codec="real").collect()
    }
    assert got == {1: (12, 7), 2: (5, 3)}
    # auto mixes real (decodable) and fake (text) per payload
    mixed = rows + [Row(doc_id=3, payload=bytearray(b"hello world"))]
    auto = {
        r.doc_id: (r.width, r.height)
        for r in decode_meta(spark.createDataFrame(mixed), codec="auto").collect()
    }
    assert auto[1] == (12, 7) and auto[3] == (11, 77)


def test_resize_fake_deterministic_and_validates(spark):
    import pytest

    from chess_lakehouse_spark.catalog import load_table
    from chess_lakehouse_spark.operators.multimodal import attach_payload, resize_image

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    pay = attach_payload(docs, "doc_id", "text")
    a = resize_image(pay, 64, 64).collect()
    assert all(r.width == 64 and r.height == 64 for r in a)
    # deterministic across runs; signature binds the target size
    b = {r.doc_id: r.resized_sig for r in resize_image(pay, 64, 64).collect()}
    c = {r.doc_id: r.resized_sig for r in resize_image(pay, 32, 32).collect()}
    assert {r.doc_id: r.resized_sig for r in a} == b
    assert all(b[i] != c[i] for i in b)
    with pytest.raises(ValueError, match="codec"):
        resize_image(pay, 64, 64, codec="bogus")


def test_resize_real_decodes_builtin_formats(spark):
    """codec='real' resize runs on REAL decoded pixels for PPM/BMP —
    nearest-neighbor index math, deterministic, size-sensitive — and
    still fails loudly on formats needing PIL when PIL is absent."""
    import hashlib

    from chess_lakehouse_spark.operators import multimodal as mm

    rows = [Row(doc_id=1, payload=bytearray(_ppm(16, 9))),
            Row(doc_id=2, payload=bytearray(_bmp(7, 5)))]
    pay = spark.createDataFrame(rows)
    a = {r.doc_id: r.resized_sig for r in mm.resize_image(pay, 8, 8, codec="real").collect()}
    b = {r.doc_id: r.resized_sig for r in mm.resize_image(pay, 8, 8, codec="real").collect()}
    c = {r.doc_id: r.resized_sig for r in mm.resize_image(pay, 4, 4, codec="real").collect()}
    assert a == b and all(a[i] != c[i] for i in a)
    # sig is md5 of the actual resized RGB bytes
    want = hashlib.md5(
        mm._resize_nearest(mm.decode_pixels_builtin(_ppm(16, 9)), 8, 8).tobytes()
    ).hexdigest()
    assert a[1] == want

    if mm._pil_image() is None:
        text_pay = mm.attach_payload(
            spark.createDataFrame([(1, "x")], ["doc_id", "text"]), "doc_id", "text"
        )
        with pytest.raises(Exception, match="PIL"):
            mm.resize_image(text_pay, 8, 8, codec="real").collect()
        # auto falls back to the fake signature instead of failing
        assert mm.resize_image(text_pay, 8, 8, codec="auto").count() == 1


def test_extract_features_histogram_semantics(spark):
    import math

    import pytest

    from chess_lakehouse_spark.operators.multimodal import attach_payload, extract_features

    df = spark.createDataFrame([(1, "aaaa"), (2, "ab")], ["doc_id", "text"])
    pay = attach_payload(df, "doc_id", "text")
    got = {r.doc_id: r for r in extract_features(pay, dim=16).collect()}
    # "aaaa": all bytes in one bucket -> unit one-hot
    f1 = got[1].features
    assert got[1].n_bytes == 4
    assert max(f1) == 1.0 and abs(sum(x * x for x in f1) - 1.0) < 1e-12
    # "ab": 'a'=97, 'b'=98 share bucket 6 (97//16 == 98//16) -> one-hot too
    f2 = got[2].features
    assert f2[6] == 1.0
    # L2 norm == 1 for nonempty payloads
    assert abs(math.sqrt(sum(x * x for x in f2)) - 1.0) < 1e-12
    with pytest.raises(ValueError, match="dim"):
        extract_features(pay, dim=7)


def test_extract_features_compose_with_knn(spark):
    """The multimodal feature column feeds the embedding operators as-is:
    identical payloads are exact cosine-1 neighbors."""
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.operators.multimodal import attach_payload, extract_features
    from chess_lakehouse_spark.operators.similarity import knn_brute_force

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "zzzzzzzz")], ["doc_id", "text"]
    )
    feats = extract_features(attach_payload(df, "doc_id", "text"), dim=16)
    probes = feats.where(F.col("doc_id") == 1)
    got = knn_brute_force(feats, probes, "doc_id", "features", k=2).collect()
    assert [(r.cand_id, r.sim) for r in got][0] == (2, 1.0)
