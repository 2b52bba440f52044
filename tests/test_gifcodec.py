"""GIF codec (operators/gifcodec.py): LZW round-trips across code-width
growth and dictionary reset, interlacing, extension skipping, palette
exactness, ValueError containment under corruption."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.gifcodec import (
    decode_gif,
    encode_gif,
)


def _noise(h, w, ncol, seed=7):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, ncol, size=(h, w, 1)).astype(np.uint8)
    return np.repeat(img, 3, axis=2)


@pytest.mark.parametrize(
    "h,w,ncol",
    [(1, 1, 2), (8, 8, 4), (33, 17, 7), (40, 60, 256), (200, 200, 256)],
)
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip(h, w, ncol, interlace):
    # 200x200 noise at 256 colors saturates the 4096-entry dictionary:
    # the width ladder to 12 bits AND the mid-stream CLEAR reset are
    # both inside this roundtrip
    img = _noise(h, w, ncol)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)


def test_rgb_bgr_convention():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = (255, 0, 0)  # pure blue in BGR
    dec = decode_gif(encode_gif(img))
    assert tuple(dec[0, 0]) == (255, 0, 0)


def test_extensions_are_skipped():
    img = _noise(5, 5, 8)
    buf = bytearray(encode_gif(img))
    # splice a graphics-control extension after the global color table
    # (13-byte header + 3*palette); find the image separator
    sep = buf.index(0x2C, 13)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE + 4-byte block + term
    patched = bytes(buf[:sep]) + ext + bytes(buf[sep:])
    assert np.array_equal(decode_gif(patched), img)


def test_too_many_colors_refused():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="256 distinct colors"):
        encode_gif(img)


def test_dimension_guards():
    hdr = b"GIF89a" + struct.pack("<HHBBB", 0, 5, 0, 0, 0)
    bad = hdr + b"\x2c" + struct.pack("<HHHHB", 0, 0, 0, 5, 0) + b"\x02\x00\x3b"
    with pytest.raises(ValueError):
        decode_gif(bad)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG8falsemagicxxx")


@settings(max_examples=80, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 10))
def test_corruption_never_leaks_foreign_exceptions(seed, n_flips):
    """Bit-flipped GIFs must either decode to SOME image or raise
    ValueError — never IndexError/struct.error/OverflowError (the
    shared codec containment contract)."""
    rng = np.random.default_rng(seed)
    buf = bytearray(encode_gif(_noise(9, 11, 16, seed=seed % 97)))
    for _ in range(n_flips):
        i = int(rng.integers(6, len(buf)))
        buf[i] ^= 1 << int(rng.integers(0, 8))
    try:
        img = decode_gif(bytes(buf))
        assert img.dtype == np.uint8 and img.ndim == 3
    except ValueError:
        pass


def test_sniff_and_decode_image_dispatch():
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.imagecodec import (
        sniff_format,
    )
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.multimodal import (
        decode_image,
    )

    img = _noise(6, 7, 5)
    buf = encode_gif(img)
    assert sniff_format(buf) == "gif"
    assert np.array_equal(decode_image(buf), img)
