"""Multimodal decode path: the round-3 real-decoder contract.

The payload is a genuine 24-bit BMP (header synthesized in-plan, pixel
bytes = the document text), so these tests exercise true byte decoding:
header parse, pixel-slice hashing, resize round-trip, and loud failure
on non-BMP bytes — no oracle involved, pure decoder semantics.
"""

from __future__ import annotations

import hashlib

import pytest

from dbt_bigquery_udf_spark.operators.multimodal import (
    BMP_PIXEL_OFFSET,
    THUMB_BOX,
    _media,
    decode_image_real,
    resize_image_real,
)


def _bmp(width: int, height: int, pixels: bytes) -> bytes:
    return (
        b"BM"
        + (BMP_PIXEL_OFFSET + len(pixels)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + BMP_PIXEL_OFFSET.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16
        + pixels
    )


def test_decode_parses_header_and_hashes_pixels():
    px = b"hello pixel bytes"
    w, h, phash, n = decode_image_real(_bmp(640, 480, px))
    assert (w, h, n) == (640, 480, len(px))
    assert phash == hashlib.md5(px).hexdigest()[:16]


def test_decode_rejects_non_bmp_loudly():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_image_real(b"GIF89a" + b"\x00" * 100)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_image_real(b"BM")  # truncated header


def test_resize_round_trips_through_decode():
    px = bytes(range(256)) * 8
    big = _bmp(1000, 500, px)
    thumb = resize_image_real(big, THUMB_BOX)
    ow, oh, _ph, tn = decode_image_real(thumb)
    assert (ow, oh) == (THUMB_BOX, 500 * THUMB_BOX // 1000)
    assert 0 < tn < len(px)  # pixel payload actually shrank
    # no upscaling: small images pass through geometry unchanged
    small = _bmp(100, 60, px[:64])
    sw, sh, _p, _n = decode_image_real(resize_image_real(small, THUMB_BOX))
    assert (sw, sh) == (100, 60)


def test_in_plan_payloads_are_valid_bmps(spark, sf_small):
    """The Spark-synthesized payloads decode as real BMPs whose fields
    match the metadata struct — the in-plan hex/unhex header assembly
    and the Python parser agree byte for byte."""
    rows = _media(spark, sf_small).select("media_blob", "meta").limit(20).collect()
    assert rows
    for r in rows:
        w, h, phash, n = decode_image_real(r.media_blob)
        assert 0 <= w < 1024 and 0 <= h < 1024
        assert n == r.meta.n_bytes
