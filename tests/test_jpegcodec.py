"""From-scratch baseline JPEG codec (operators/jpegcodec.py, r6):
round-trip fidelity across every mode (4:4:4, 4:2:0, grayscale,
restart markers), exactness properties, ValueError containment under
corruption, cv2/PIL parity when present, and the Spark decode path
end-to-end through decode_image."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    e = (a.astype(np.float64) - b.astype(np.float64)) ** 2
    return 10 * np.log10(255.0**2 / max(1e-9, e.mean()))


def _smooth(h: int, w: int, seed: int = 0) -> np.ndarray:
    """A JPEG-friendly smooth gradient test image."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 / max(1, w - 1)),
            (yy * 255 / max(1, h - 1)),
            np.full((h, w), float(rng.randint(0, 256))),
        ],
        axis=-1,
    )
    return np.floor(img + 0.5).astype(np.uint8)


@pytest.mark.parametrize(
    "kw,floor_db",
    [
        (dict(), 40.0),
        (dict(subsample=True), 35.0),
        (dict(restart_interval=3), 40.0),
        (dict(subsample=True, restart_interval=2), 35.0),
    ],
)
def test_roundtrip_psnr_floor(kw, floor_db):
    img = _smooth(48, 64)
    out = decode_jpeg(encode_jpeg(img, quality=90, **kw))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(out, img) >= floor_db


def test_solid_color_exact():
    """DC-only blocks survive quantization exactly for flat images."""
    for v in (0, 77, 200, 255):
        img = np.full((16, 24, 3), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert np.abs(out.astype(int) - v).max() <= 1


def test_grayscale_single_component():
    img = _smooth(24, 40, seed=3)
    out = decode_jpeg(encode_jpeg(img, quality=90, grayscale=True))
    assert out.shape == img.shape
    # all three output channels identical (Y replicated)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 1], out[:, :, 2])
    y = np.floor(
        0.299 * img[:, :, 2] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 0] + 0.5
    )
    assert _psnr(out[:, :, 0].astype(np.uint8), y.astype(np.uint8)) >= 45.0


@pytest.mark.parametrize("shape", [(7, 5), (17, 23), (8, 8), (33, 31)])
@pytest.mark.parametrize("sub", [False, True])
def test_non_multiple_of_mcu_dimensions(shape, sub):
    """Edge padding must crop back to the declared size exactly."""
    rng = np.random.RandomState(shape[0] * 100 + shape[1])
    img = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
    assert out.shape == img.shape


def test_restart_marker_interval_equivalence():
    """Restart markers change the byte stream but not the pixels."""
    img = _smooth(32, 48, seed=5)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    for ri in (1, 2, 5):
        with_rst = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=ri))
        assert np.array_equal(base, with_rst)


def test_mismarked_and_bad_buffers_raise_valueerror():
    img = _smooth(16, 16)
    buf = bytearray(encode_jpeg(img, quality=90))
    # flip SOF0 (FFC0) to SOF2 (FFC2): the stream then claims to be
    # progressive but carries a full-band interleaved scan, which is
    # illegal in a progressive frame (T.81 G.1: DC-only first scan) —
    # must still refuse loudly, never mis-decode (r7: SOF2 itself is
    # now SUPPORTED; see test_progressive_roundtrip_*)
    i = bytes(buf).index(b"\xff\xc0")
    prog = bytes(buf[:i]) + b"\xff\xc2" + bytes(buf[i + 2 :])
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff")  # magic only
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 8))
def test_corrupted_jpeg_never_leaks_foreign_exceptions(seed, n_flips):
    """Same ValueError contract as PNG/BMP: corruption (magic kept)
    either still decodes to SOME uint8 image or raises ValueError —
    never struct.error / IndexError / KeyError, which would escape
    decode_image's fallback and kill a Spark task."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (10, 12, 3), dtype=np.uint8)
    buf = bytearray(encode_jpeg(img, quality=80))
    for _ in range(n_flips):
        pos = int(rng.randint(3, len(buf)))  # keep FFD8FF magic
        buf[pos] = int(rng.randint(0, 256))
    if rng.randint(0, 2):
        buf = buf[: int(rng.randint(4, len(buf)))]
    try:
        out = decode_jpeg(bytes(buf))
        assert out.dtype == np.uint8 and out.ndim == 3
    except ValueError:
        pass


def test_parity_with_native_decoder_when_present():
    """When cv2/PIL exist, their decode of OUR bytes must be close to
    ours (both implement the same spec; tiny IDCT rounding differences
    allowed)."""
    try:
        import cv2
    except ImportError:
        cv2 = None
    try:
        from PIL import Image
    except ImportError:
        Image = None
    if cv2 is None and Image is None:
        pytest.skip("no native decoder in this container")
    img = _smooth(32, 32, seed=9)
    buf = encode_jpeg(img, quality=90)
    ours = decode_jpeg(buf)
    if cv2 is not None:
        theirs = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
    else:
        import io

        theirs = np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))[:, :, ::-1]
    assert _psnr(ours, theirs) >= 45.0


def test_spark_decode_image_routes_jpeg(spark):
    """End-to-end through the mapInPandas feature path: JPEG payloads
    decode to real pixels (fire_pixel_count sees the encoded flame
    band, not stub bytes)."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.multimodal import (
        decode_image,
        fire_pixel_count,
    )

    # a frame whose center is flame-colored (BGR orange) on black
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[8:24, 8:24] = (0, 200, 255)  # BGR orange, hue ~24 (fire band 18-35)
    buf = encode_jpeg(img, quality=95)
    decoded = decode_image(buf)
    assert decoded.shape == (32, 32, 3)  # real decode, not the 8x8 stub
    n_fire = fire_pixel_count(decoded)
    assert n_fire >= 150  # the 16x16 flame patch survives compression

    import pandas as pd

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.multimodal import (
        scan_fire_pixels,
    )

    # the mapInPandas stage over (doc_id, payload) — fire_pixel_scan's
    # worker, driven with JPEG payloads instead of the text stand-ins
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [buf, b"\x00" * 16]})
    sdf = spark.createDataFrame(pdf).mapInPandas(
        scan_fire_pixels, schema="doc_id long, fire_pixels long"
    )
    rows = {r.doc_id: r.fire_pixels for r in sdf.collect()}
    assert rows[1] >= 150
    assert rows[2] >= 0  # stub path still total


# --- progressive (SOF2) decode, r7 ------------------------------------------

def _noisy(h: int, w: int, seed: int = 7) -> np.ndarray:
    """Textured image: dense AC coefficients exercise ZRL, multi-size
    magnitudes, and refinement correction bits."""
    rng = np.random.RandomState(seed)
    base = _smooth(h, w, seed)
    noise = rng.randint(-40, 41, size=base.shape)
    return np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "shape,kw",
    [
        ((16, 16), dict()),
        ((24, 40), dict()),
        ((17, 23), dict()),                    # non-multiple-of-8
        ((24, 40), dict(subsample=True)),
        ((21, 35), dict(subsample=True)),      # padded-fringe blocks
        ((16, 16), dict(grayscale=True)),
        ((19, 30), dict(grayscale=True)),
        ((24, 40), dict(restart_interval=3)),
        ((24, 40), dict(subsample=True, restart_interval=2)),
    ],
)
def test_progressive_roundtrip_bit_exact_with_baseline(shape, kw):
    """encode_jpeg_progressive writes the SAME quantized coefficients
    as encode_jpeg, so decoding both must agree PIXEL-FOR-PIXEL — the
    strongest possible oracle for the progressive entropy path (DC
    successive approximation, EOBn runs, ZRL-in-refinement,
    correction-bit buffering, restart handling)."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.jpegcodec import (
        encode_jpeg_progressive,
    )

    for quality in (90, 50):
        img = _noisy(*shape)
        base = decode_jpeg(encode_jpeg(img, quality=quality, **kw))
        prog_buf = encode_jpeg_progressive(img, quality=quality, **kw)
        assert b"\xff\xc2" in prog_buf  # really SOF2
        prog = decode_jpeg(prog_buf)
        assert np.array_equal(base, prog)


def test_progressive_eobn_run_accumulation():
    """A flat image makes every AC band all-zero: the encoder folds
    whole block columns into one EOBn with r>0 (symbols Annex K
    doesn't even define) and the decoder must honor the run length."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.jpegcodec import (
        encode_jpeg_progressive,
    )

    img = np.full((48, 48, 3), 119, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert np.array_equal(base, prog)
    assert np.all(prog == prog[0, 0])  # stays solid


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 8))
def test_corrupted_progressive_never_leaks_foreign_exceptions(seed, n_flips):
    """Same total-degrade contract as the baseline fuzz: bit-flipped
    progressive streams either decode to SOME image or ValueError —
    never KeyError/IndexError/struct.error, never a hang."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.jpegcodec import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed)
    buf = bytearray(encode_jpeg_progressive(_noisy(16, 24), quality=80))
    for _ in range(n_flips):
        i = rng.randint(2, len(buf))
        buf[i] ^= 1 << rng.randint(0, 8)
    try:
        out = decode_jpeg(bytes(buf))
        assert out.dtype == np.uint8 and out.ndim == 3
    except ValueError:
        pass
