"""Multimodal codec path selection: deterministic fake in codec-less
containers, soft upgrade to PIL when importable, loud failure on strict
real mode without codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from chess_lakehouse_spark.operators.multimodal import (
    _pil_image,
    attach_payload,
    decode_image,
    decode_image_real,
    decode_meta,
)


def _payloads(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello world")])
    return attach_payload(df, "doc_id", "text")


def test_decode_meta_fake_is_deterministic(spark):
    r = decode_meta(_payloads(spark)).collect()[0]
    assert (r.n_bytes, r.width, r.height) == (11, 11, 77)


def test_decode_meta_auto_falls_back_without_pil(spark):
    if _pil_image() is not None:
        pytest.skip("PIL present: fallback path not reachable")
    fake = decode_meta(_payloads(spark)).collect()
    auto = decode_meta(_payloads(spark), codec="auto").collect()
    assert fake == auto


def test_decode_meta_real_requires_pil(spark):
    if _pil_image() is not None:
        pytest.skip("PIL present: strict mode would succeed")
    with pytest.raises(NotImplementedError):
        decode_meta(_payloads(spark), codec="real")
    with pytest.raises(NotImplementedError):
        decode_image_real(b"xx")


def test_decode_meta_rejects_unknown_codec(spark):
    with pytest.raises(ValueError):
        decode_meta(_payloads(spark), codec="webp")


def test_decode_image_real_path_with_pil(spark):
    Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    assert decode_image(buf.getvalue()) == (12, 7)
    r = (
        decode_meta(
            spark.createDataFrame([Row(doc_id=1, payload=bytearray(buf.getvalue()))]),
            codec="real",
        ).collect()[0]
    )
    assert (r.width, r.height) == (12, 7)
