"""TIFF codec (operators/tiffcodec.py): strip/PackBits round-trips in
both byte orders, gray + RGB, inline vs out-of-line strip arrays,
unsupported-corner refusals, ValueError containment under corruption."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.tiffcodec import (
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("gray", [False, True])
@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (40, 33)])
def test_roundtrip_matrix(shape, packbits, big_endian, gray):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=(*shape, 3)).astype(np.uint8)
    if gray:
        img = np.repeat(img[:, :, :1], 3, axis=2)
    buf = encode_tiff(img, packbits=packbits, big_endian=big_endian, gray=gray)
    assert np.array_equal(decode_tiff(buf), img)


def test_single_strip_inline_arrays():
    img = np.full((3, 4, 3), 9, dtype=np.uint8)
    buf = encode_tiff(img, rows_per_strip=64)  # one strip → inline offsets
    assert np.array_equal(decode_tiff(buf), img)


def test_packbits_rle_branches():
    # replicate, literal, and the 128-byte cap all round-trip
    rows = [
        b"\x00" * 300,
        bytes(range(200)),
        b"ab" + b"c" * 130 + b"de",
        b"",
    ]
    for row in rows:
        assert _packbits_decode(_packbits_encode(row), len(row)) == row


def test_refusals():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    buf = bytearray(encode_tiff(img, packbits=False))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX\x00\x00")
    # flip the compression tag value to LZW (5): must refuse, not decode
    comp_at = buf.find(struct.pack("<HHI", 259, 3, 1))
    assert comp_at > 0
    buf[comp_at + 8] = 5
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(buf))


@settings(max_examples=80, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 10))
def test_corruption_never_leaks_foreign_exceptions(seed, n_flips):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(6, 9, 3)).astype(np.uint8)
    buf = bytearray(encode_tiff(img, packbits=bool(seed & 1)))
    for _ in range(n_flips):
        i = int(rng.integers(4, len(buf)))
        buf[i] ^= 1 << int(rng.integers(0, 8))
    try:
        out = decode_tiff(bytes(buf))
        assert out.dtype == np.uint8 and out.ndim == 3
    except ValueError:
        pass


def test_sniff_and_dispatch():
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.imagecodec import (
        sniff_format,
    )
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.multimodal import (
        decode_image,
    )

    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3) % 251
    for be in (False, True):
        buf = encode_tiff(img, big_endian=be)
        assert sniff_format(buf) == "tiff"
        assert np.array_equal(decode_image(buf), img)
