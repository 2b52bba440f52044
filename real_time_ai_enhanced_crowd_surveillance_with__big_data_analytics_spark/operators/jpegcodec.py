"""Pure numpy+stdlib JPEG codec, baseline (SOF0) + progressive (SOF2)
(SURVEY.md P1 — the last gated format of the image-decode family made
real).

r5 made PNG/BMP decode real without cv2/PIL; JPEG stayed behind the
native-lib gate ("out of scope, not out of principle"). This closes
it: a from-scratch JFIF baseline (SOF0) codec —

* **decode_jpeg**: marker parse → DQT/DHT/SOF0/SOS (+DRI restart
  markers) → Huffman entropy decode → dequant → 8×8 IDCT (orthonormal
  DCT-III as two matrix products) → nearest-neighbor chroma upsample →
  YCbCr→BGR (JFIF/BT.601 full-range). Supports 1- and 3-component
  images with sampling factors 1 or 2 per axis (grayscale, 4:4:4,
  4:2:2, 4:2:0). r7: progressive (SOF2) decode per T.81 Annex G —
  multi-scan spectral selection + successive approximation (DC/AC
  first and refinement scans, EOBn runs, non-interleaved component
  grids, restart markers), verified bit-exact against the baseline
  twin of the same quantized coefficients. Arithmetic coding, 12-bit
  precision, and 16-bit quant tables raise ValueError — the same
  total-degrade contract as the PNG/BMP decoders (decode_image falls
  back to the deterministic stub; with cv2/PIL present the native
  path handles them).
* **encode_jpeg** (+ **encode_jpeg_progressive**, the SOF2 oracle
  emitting the SAME quantized coefficients): the round-trip partner
  and test oracle — Annex K
  quant tables scaled by libjpeg's quality curve, Annex K Huffman
  tables, optional 4:2:0 subsampling, DC DPCM + AC run/size with
  ZRL/EOB, byte stuffing.

Everything block-transform-sized is vectorized (the DCT runs as one
einsum over ALL blocks of a component at once); only the entropy
coder is a per-symbol Python loop — inherent to Huffman's serial bit
stream. These run inside Arrow-batched mapInPandas workers, one call
per image; for decode-bound pipelines the cv2/PIL gate stays the fast
path, exactly as documented for Paeth-heavy PNGs.

No reference to any external JPEG implementation beyond the public
ITU-T T.81 spec constants (Annex K tables, zigzag order, quality
curve) — all tables are spec values.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"
MAX_DIM = 32_768  # same per-axis guard as PNG/BMP

# --- spec constants (ITU-T T.81) ---------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 quantization tables (luminance, chrominance), natural order
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: forward X = D @ x @ D.T, inverse D.T @ X @ D
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.25) if _k else np.sqrt(0.125)
        )


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's published quality curve over the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for t in (QTBL_LUMA, QTBL_CHROMA):
        s = np.clip((t * scale + 50) // 100, 1, 255)
        out.append(s.astype(np.int32))
    return out[0], out[1]


def _build_huffman(bits: list[int], vals: list[int]):
    """(code_for_value for encode, {(length, code): value} for decode)."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (length, code)
            dec[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


_TABLES = {
    "dc0": _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS),
    "dc1": _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS),
    "ac0": _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS),
    "ac1": _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS),
}

# Progressive AC scans emit EOBn symbols ((r<<4)|0, r=1..14) that the
# Annex K tables do not define, so the progressive ENCODER carries its
# own complete AC table: all 256 (run, size) byte values, 255 at code
# length 9 + 1 at length 10 (Kraft sum 255/512 + 1/1024 < 1; the
# all-ones max-length code stays unused as T.81 requires). Flat-ish
# and compression-poor, but always legal — the oracle encoder values
# totality over ratio. The decoder needs nothing special: it reads
# whatever DHT declares.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = list(range(256))
_PROG_AC = _build_huffman(PROG_AC_BITS, PROG_AC_VALS)

MAX_EOBRUN = 0x7FFF  # T.81 G.1.2.2: EOBn codes runs up to 2^15 - 1


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + amplitude bits for a signed value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude: sign-extend `size` amplitude bits."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def restart(self, n: int) -> None:
        """Byte-align (pad 1s) and emit RSTn — markers are not stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)
        self.out += bytes([0xFF, 0xD0 + (n % 8)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # spec: pad past the end with 1s (EOI truncation shows
                # up as Huffman decode failure, raised by the caller)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed zero
                else:
                    # marker reached — unread the 0xFF and pad
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:
            raise ValueError("truncated JPEG entropy stream")
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        """Consume a restart marker (entropy stream is byte-aligned)."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG at restart marker")
        if self.data[self.pos] != 0xFF or (self.data[self.pos + 1] & 0xF8) != 0xD0:
            raise ValueError("expected JPEG restart marker")
        if (self.data[self.pos + 1] & 0x07) != n:
            raise ValueError("out-of-order JPEG restart marker")
        self.pos += 2


# --- encoder ------------------------------------------------------------------


def _bgr_to_ycbcr(bgr: np.ndarray) -> np.ndarray:
    b = bgr[:, :, 0].astype(np.float64)
    g = bgr[:, :, 1].astype(np.float64)
    r = bgr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_bgr(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([b, g, r], axis=-1)
    return np.floor(out + 0.5).clip(0, 255).astype(np.uint8)


def _pad_to(img: np.ndarray, mult: int) -> np.ndarray:
    h, w = img.shape[:2]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        img = np.pad(img, [(0, ph), (0, pw)], mode="edge")
    return img


def _blockify(ch: np.ndarray) -> np.ndarray:
    """(H, W) → (H//8 * W//8, 8, 8) in raster block order."""
    h, w = ch.shape
    return (
        ch.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _deblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


def _encode_component_blocks(
    wr: _BitWriter, qblocks: np.ndarray, pred: int, dc_t, ac_t
) -> int:
    dc_enc, ac_enc = dc_t[0], ac_t[0]
    for blk in qblocks:
        zz = blk.reshape(64)[ZIGZAG]
        dc = int(zz[0])
        size, bits = _magnitude(dc - pred)
        pred = dc
        ln, code = dc_enc[size]
        wr.write(ln, code)
        wr.write(size, bits)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_enc[0xF0]  # ZRL
                wr.write(ln, code)
                run -= 16
            size, bits = _magnitude(v)
            ln, code = ac_enc[(run << 4) | size]
            wr.write(ln, code)
            wr.write(size, bits)
            run = 0
        if last < 63:
            ln, code = ac_enc[0x00]  # EOB
            wr.write(ln, code)
    return pred


def encode_jpeg(
    bgr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """uint8 BGR (h, w, 3) → baseline JFIF bytes. ``subsample=True``
    writes 4:2:0 (chroma averaged 2×2), else 4:4:4; ``grayscale``
    writes a 1-component (Y only) scan; ``restart_interval`` emits a
    DRI segment and RSTn markers every N MCUs (predictors reset) —
    exists chiefly so the decoder's restart path has a test oracle."""
    if bgr.ndim != 3 or bgr.shape[2] != 3 or bgr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 (h, w, 3) BGR")
    if grayscale and subsample:
        raise ValueError("grayscale has a single component; no subsampling")
    h, w = bgr.shape[:2]
    qy, qc = _quality_tables(quality)
    ycc = _bgr_to_ycbcr(bgr)
    mult = 16 if subsample else 8
    padded = np.stack(
        [_pad_to(ycc[:, :, c], mult) for c in range(3)], axis=-1
    )
    comps = []  # (channel array, qtable, h_factor, v_factor)
    ych = padded[:, :, 0]
    if grayscale:
        comps = [(ych, qy, 1, 1)]
    elif subsample:
        cb = padded[:, :, 1].reshape(
            padded.shape[0] // 2, 2, padded.shape[1] // 2, 2
        ).mean(axis=(1, 3))
        cr = padded[:, :, 2].reshape(
            padded.shape[0] // 2, 2, padded.shape[1] // 2, 2
        ).mean(axis=(1, 3))
        comps = [(ych, qy, 2, 2), (cb, qc, 1, 1), (cr, qc, 1, 1)]
    else:
        comps = [(ych, qy, 1, 1), (padded[:, :, 1], qc, 1, 1),
                 (padded[:, :, 2], qc, 1, 1)]

    # forward DCT + quantize all blocks per component
    qblocks = []
    for ch, qt, _hf, _vf in comps:
        blocks = _blockify(ch - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        qb = np.floor(coef / qt.reshape(8, 8) + 0.5).astype(np.int32)
        qblocks.append(qb)

    nc = len(comps)
    # header
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qy), (1, qc))[: 1 if grayscale else 2]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in qt.reshape(64)[ZIGZAG])
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid, (_ch, _qt, hf, vf) in enumerate(comps, start=1):
        out += bytes([cid, (hf << 4) | vf, 0 if cid == 1 else 1])
    # DHT
    huff_decls = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not grayscale:
        huff_decls += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for marker_id, bits, vals in huff_decls:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([marker_id]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for cid in range(1, nc + 1):
        out += bytes([cid, 0x00 if cid == 1 else 0x11])
    out += b"\x00\x3f\x00"

    wr = _BitWriter()
    # interleaved MCU walk, generic over sampling factors
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = comps[0][0].shape[1] // (8 * hmax)
    mcuy = comps[0][0].shape[0] // (8 * vmax)
    preds = [0] * nc
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                wr.restart(rst_n)
                rst_n = (rst_n + 1) % 8
                preds = [0] * nc
            for c, (ch, _qt, hf, vf) in enumerate(comps):
                t = "0" if c == 0 else "1"
                cbw = ch.shape[1] // 8
                for dy in range(vf):
                    for dx in range(hf):
                        bi = (my * vf + dy) * cbw + (mx * hf + dx)
                        preds[c] = _encode_component_blocks(
                            wr, qblocks[c][bi : bi + 1], preds[c],
                            _TABLES["dc" + t], _TABLES["ac" + t])
            mcu_count += 1
    out += wr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder (the decoder's round-trip oracle) ---------------------


def _emit_eobrun(wr: _BitWriter, enc, eobrun: int, run_bits: list[int]) -> int:
    """Flush an accumulated EOB run (T.81 G.1.2.2: symbol (nbits<<4) +
    nbits extra bits) followed by the correction bits buffered behind
    it (refinement scans only; empty list in first scans)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        ln, code = enc[nbits << 4]
        wr.write(ln, code)
        if nbits:
            wr.write(nbits, eobrun - (1 << nbits))
    for b in run_bits:
        wr.write(1, b)
    run_bits.clear()
    return 0


def _enc_ac_first_scan(
    wr: _BitWriter, zz: np.ndarray, order, ss: int, se: int, al: int,
    restart_interval: int,
) -> None:
    enc = _PROG_AC[0]
    eobrun = 0
    no_bits: list[int] = []
    unit = 0
    rst = 0
    for bi in order:
        if restart_interval and unit and unit % restart_interval == 0:
            eobrun = _emit_eobrun(wr, enc, eobrun, no_bits)
            wr.restart(rst)
            rst = (rst + 1) % 8
        row = zz[bi]
        r = 0
        for k in range(ss, se + 1):
            t = int(row[k])
            t = -((-t) >> al) if t < 0 else t >> al  # point transform
            if t == 0:
                r += 1
                continue
            eobrun = _emit_eobrun(wr, enc, eobrun, no_bits)
            while r > 15:
                ln, code = enc[0xF0]
                wr.write(ln, code)
                r -= 16
            size, bits = _magnitude(t)
            ln, code = enc[(r << 4) | size]
            wr.write(ln, code)
            wr.write(size, bits)
            r = 0
        if r > 0:  # band ends in zeros: this block joins an EOB run
            eobrun += 1
            if eobrun == MAX_EOBRUN:
                eobrun = _emit_eobrun(wr, enc, eobrun, no_bits)
        unit += 1
    _emit_eobrun(wr, enc, eobrun, no_bits)


def _enc_ac_refine_scan(
    wr: _BitWriter, zz: np.ndarray, order, ss: int, se: int, al: int,
    restart_interval: int,
) -> None:
    enc = _PROG_AC[0]
    eobrun = 0
    run_bits: list[int] = []  # correction bits riding with the EOB run
    unit = 0
    rst = 0
    for bi in order:
        if restart_interval and unit and unit % restart_interval == 0:
            eobrun = _emit_eobrun(wr, enc, eobrun, run_bits)
            wr.restart(rst)
            rst = (rst + 1) % 8
        row = zz[bi]
        absv = []
        eob = ss - 1  # position of the last newly-significant coef
        for k in range(ss, se + 1):
            t = int(row[k])
            a = (-t if t < 0 else t) >> al
            absv.append(a)
            if a == 1:
                eob = k
        r = 0
        cur_bits: list[int] = []  # correction bits of this block so far
        for k in range(ss, se + 1):
            a = absv[k - ss]
            if a == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                eobrun = _emit_eobrun(wr, enc, eobrun, run_bits)
                ln, code = enc[0xF0]
                wr.write(ln, code)
                r -= 16
                for b in cur_bits:
                    wr.write(1, b)
                cur_bits.clear()
            if a > 1:  # history coefficient: buffer its correction bit
                cur_bits.append(a & 1)
                continue
            # newly significant (a == 1): symbol, sign, then the bits
            # of the history coefficients passed over
            eobrun = _emit_eobrun(wr, enc, eobrun, run_bits)
            ln, code = enc[(r << 4) | 1]
            wr.write(ln, code)
            wr.write(1, 1 if int(row[k]) > 0 else 0)
            for b in cur_bits:
                wr.write(1, b)
            cur_bits.clear()
            r = 0
        if r > 0 or cur_bits:  # block ends inside an EOB run
            eobrun += 1
            run_bits.extend(cur_bits)
            if eobrun == MAX_EOBRUN:
                eobrun = _emit_eobrun(wr, enc, eobrun, run_bits)
        unit += 1
    _emit_eobrun(wr, enc, eobrun, run_bits)


def encode_jpeg_progressive(
    bgr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 BGR (h, w, 3) → PROGRESSIVE (SOF2) JFIF bytes carrying the
    SAME quantized coefficients as ``encode_jpeg`` with the same
    arguments — so ``decode_jpeg`` of both must be bit-identical,
    which is the round-trip oracle for the progressive decode path.

    Scan script (T.81 Annex G spectral selection + successive
    approximation, the shape real encoders emit): interleaved DC first
    scan at Al=1, DC refinement, then per component two AC bands
    (1-5, 6-63) each as a first scan at Al=1 plus a refinement —
    exercising EOBn run accumulation, ZRL-in-refinement, and
    correction-bit buffering. AC scans use a complete 256-symbol
    Huffman table (PROG_AC_BITS) because Annex K defines no EOBn
    symbols. ``restart_interval`` applies per MCU in the DC scans and
    per block in the AC scans, flushing EOB runs and resetting
    predictors, per G.1.2."""
    if bgr.ndim != 3 or bgr.shape[2] != 3 or bgr.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive expects uint8 (h, w, 3) BGR")
    if grayscale and subsample:
        raise ValueError("grayscale has a single component; no subsampling")
    h, w = bgr.shape[:2]
    qy, qc = _quality_tables(quality)
    ycc = _bgr_to_ycbcr(bgr)
    mult = 16 if subsample else 8
    padded = np.stack(
        [_pad_to(ycc[:, :, c], mult) for c in range(3)], axis=-1
    )
    ych = padded[:, :, 0]
    if grayscale:
        comps = [(ych, qy, 1, 1)]
    elif subsample:
        cb = padded[:, :, 1].reshape(
            padded.shape[0] // 2, 2, padded.shape[1] // 2, 2
        ).mean(axis=(1, 3))
        cr = padded[:, :, 2].reshape(
            padded.shape[0] // 2, 2, padded.shape[1] // 2, 2
        ).mean(axis=(1, 3))
        comps = [(ych, qy, 2, 2), (cb, qc, 1, 1), (cr, qc, 1, 1)]
    else:
        comps = [(ych, qy, 1, 1), (padded[:, :, 1], qc, 1, 1),
                 (padded[:, :, 2], qc, 1, 1)]

    # quantized coefficients in zigzag order, (nblocks, 64) per comp —
    # numerically identical to encode_jpeg's blocks
    qzz = []
    for ch, qt, _hf, _vf in comps:
        blocks = _blockify(ch - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        qb = np.floor(coef / qt.reshape(8, 8) + 0.5).astype(np.int32)
        qzz.append(qb.reshape(-1, 64)[:, ZIGZAG])

    nc = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = comps[0][0].shape[1] // (8 * hmax)
    mcuy = comps[0][0].shape[0] // (8 * vmax)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qy), (1, qc))[: 1 if grayscale else 2]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in qt.reshape(64)[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid, (_ch, _qt, hf, vf) in enumerate(comps, start=1):
        out += bytes([cid, (hf << 4) | vf, 0 if cid == 1 else 1])
    huff_decls = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS)]
    if not grayscale:
        huff_decls.append((0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
    huff_decls.append((0x10, PROG_AC_BITS, PROG_AC_VALS))
    for marker_id, bits, vals in huff_decls:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([marker_id]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos(specs, ss, se, ah, al):
        out.extend(b"\xff\xda")
        out.extend(struct.pack(">HB", 6 + 2 * len(specs), len(specs)))
        for cs, td, ta in specs:
            out.extend(bytes([cs, (td << 4) | ta]))
        out.extend(bytes([ss, se, (ah << 4) | al]))

    def noninterleaved_order(ci):
        _ch, _qt, hf, vf = comps[ci]
        cw = -(-(w * hf) // hmax)
        chh = -(-(h * vf) // vmax)
        bwn, bhn, stride = -(-cw // 8), -(-chh // 8), mcux * hf
        return [
            by * stride + bx for by in range(bhn) for bx in range(bwn)
        ]

    # --- scan 1: DC first, all components interleaved, Al=1
    dc_specs = [
        (cid, 0 if cid == 1 else 1, 0) for cid in range(1, nc + 1)
    ]
    sos(dc_specs, 0, 0, 0, 1)
    wr = _BitWriter()
    preds = [0] * nc
    unit = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and unit and unit % restart_interval == 0:
                wr.restart(rst)
                rst = (rst + 1) % 8
                preds = [0] * nc
            for c in range(nc):
                _ch, _qt, hf, vf = comps[c]
                dc_enc = _TABLES["dc0" if c == 0 else "dc1"][0]
                for dy in range(vf):
                    for dx in range(hf):
                        bi = (my * vf + dy) * (mcux * hf) + (mx * hf + dx)
                        v = int(qzz[c][bi, 0]) >> 1
                        size, bits = _magnitude(v - preds[c])
                        preds[c] = v
                        ln, code = dc_enc[size]
                        wr.write(ln, code)
                        wr.write(size, bits)
            unit += 1
    out += wr.flush()

    # --- scan 2: DC refinement (raw bit 0 of each DC), interleaved
    sos(dc_specs, 0, 0, 1, 0)
    wr = _BitWriter()
    unit = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and unit and unit % restart_interval == 0:
                wr.restart(rst)
                rst = (rst + 1) % 8
            for c in range(nc):
                _ch, _qt, hf, vf = comps[c]
                for dy in range(vf):
                    for dx in range(hf):
                        bi = (my * vf + dy) * (mcux * hf) + (mx * hf + dx)
                        wr.write(1, int(qzz[c][bi, 0]) & 1)
            unit += 1
    out += wr.flush()

    # --- AC scans: two spectral bands per component, first then refine
    bands = ((1, 5), (6, 63))
    for ci in range(nc):
        order = noninterleaved_order(ci)
        for ss, se in bands:
            sos([(ci + 1, 0, 0)], ss, se, 0, 1)
            wr = _BitWriter()
            _enc_ac_first_scan(wr, qzz[ci], order, ss, se, 1,
                               restart_interval)
            out += wr.flush()
    for ci in range(nc):
        order = noninterleaved_order(ci)
        for ss, se in bands:
            sos([(ci + 1, 0, 0)], ss, se, 1, 0)
            wr = _BitWriter()
            _enc_ac_refine_scan(wr, qzz[ci], order, ss, se, 0,
                                restart_interval)
            out += wr.flush()

    out += b"\xff\xd9"
    return bytes(out)


# --- decoder ------------------------------------------------------------------


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JFIF bytes → uint8 BGR
    (grayscale replicated to 3 channels). Raises ValueError on
    anything outside that support (arithmetic, 12-bit, lossless);
    never leaks struct/index errors (the decode_image seam contract)."""
    try:
        return _decode_jpeg_inner(buf)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError) as ex:
        raise ValueError(f"malformed JPEG: {type(ex).__name__}") from ex


def _entropy_end(buf: bytes, start: int) -> int:
    """Position of the marker terminating an entropy-coded segment:
    stuffed 0xFF00 bytes and RSTn markers belong to the segment."""
    p, n = start, len(buf)
    while p + 1 < n:
        if buf[p] == 0xFF:
            nxt = buf[p + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return n


def _noninterleaved_blocks(
    frame, geom, hf: int, vf: int
) -> tuple[int, int, int]:
    """(blocks_wide, blocks_high, row_stride) of a component's
    NON-INTERLEAVED scan grid (T.81 A.2.2: ceil of the component's own
    scaled dimensions, NOT the MCU-padded grid — the padded fringe
    blocks are coded only by interleaved scans)."""
    h, w, _comps = frame
    hmax, vmax, mcux, _mcuy = geom
    cw = -(-(w * hf) // hmax)
    chh = -(-(h * vf) // vmax)
    return -(-cw // 8), -(-chh // 8), mcux * hf


def _refine_nonzero(rd: _BitReader, row: np.ndarray, k: int, al: int) -> None:
    """AC successive-approximation correction of an already-nonzero
    coefficient (T.81 G.1.2.3): one bit; if set and bit `al` is still
    clear, the magnitude grows by one unit toward its sign."""
    if rd.read(1) and (int(row[k]) & (1 << al)) == 0:
        row[k] += (1 << al) if int(row[k]) > 0 else -(1 << al)


def _prog_ac_first_block(
    rd: _BitReader, act, row: np.ndarray, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """First AC scan of a band (T.81 G.1.2.2): run/size coding with
    EOBn run accumulation; coefficients land point-transformed
    (value << Al). Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.huff(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn includes the current block
            if r:
                eobrun += rd.read(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC index overflow")
        row[k] = _extend(rd.read(s), s) << al
        k += 1
    return eobrun


def _prog_ac_refine_block(
    rd: _BitReader, act, row: np.ndarray, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """Refinement AC scan of a band (T.81 G.1.2.3). Newly-significant
    coefficients arrive as ±1<<Al; every already-nonzero coefficient
    passed over (or covered by an EOB run) reads one correction bit.
    Returns the remaining EOB run."""
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.huff(act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.read(r)
                    break
                # r == 15: pass over sixteen zero-history coefficients
            elif s == 1:
                newval = (1 << al) if rd.read(1) else -(1 << al)
            else:
                raise ValueError("invalid JPEG refinement symbol")
            while k <= se:
                if row[k] != 0:
                    _refine_nonzero(rd, row, k, al)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("JPEG AC refinement overflow")
                row[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if row[k] != 0:
                _refine_nonzero(rd, row, k, al)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    buf: bytes,
    start: int,
    frame,
    geom,
    scan_comps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    htables,
    coefzz,
    restart_interval: int,
) -> int:
    """Decode one progressive scan's entropy data into the coefficient
    store; returns the buffer position of the terminating marker."""
    _h, _w, comps = frame
    hmax, vmax, mcux, mcuy = geom
    if not (0 <= ss <= se <= 63 and al <= 13 and ah <= 13):
        raise ValueError("invalid JPEG spectral selection")
    if ah and ah != al + 1:
        raise ValueError("non-contiguous JPEG successive approximation")
    idxs = []  # (frame comp index, Td, Ta)
    for cs, td, ta in scan_comps:
        match = [i for i, c in enumerate(comps) if c[0] == cs]
        if not match:
            raise ValueError("JPEG scan/frame component mismatch")
        idxs.append((match[0], td, ta))
    rd = _BitReader(buf[start:])
    rst_n = 0
    unit = 0  # MCUs (interleaved) or blocks (non-interleaved)

    def maybe_restart(reset):
        nonlocal rst_n
        if restart_interval and unit and unit % restart_interval == 0:
            rd.align_and_expect_rst(rst_n)
            rst_n = (rst_n + 1) % 8
            reset()

    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        preds = [0] * len(idxs)

        def reset_dc():
            nonlocal preds
            preds = [0] * len(idxs)

        def dc_one(j, ci, bi, dct):
            if ah == 0:
                size = rd.huff(dct)
                preds[j] += _extend(rd.read(size), size)
                coefzz[ci][bi, 0] = preds[j] << al
            elif rd.read(1):
                coefzz[ci][bi, 0] |= 1 << al

        if len(idxs) > 1:  # interleaved over the MCU grid
            tables = []
            for j, (ci, td, _ta) in enumerate(idxs):
                dct = htables.get((0, td)) if ah == 0 else None
                if ah == 0 and dct is None:
                    raise ValueError("JPEG Huffman table missing")
                tables.append(dct)
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(reset_dc)
                    for j, (ci, _td, _ta) in enumerate(idxs):
                        _cid, hf, vf, _tq = comps[ci]
                        for dy in range(vf):
                            for dx in range(hf):
                                bi = (my * vf + dy) * (mcux * hf) + (
                                    mx * hf + dx
                                )
                                dc_one(j, ci, bi, tables[j])
                    unit += 1
        else:  # single-component DC scan: the component's own grid
            ci, td, _ta = idxs[0]
            _cid, hf, vf, _tq = comps[ci]
            dct = htables.get((0, td)) if ah == 0 else None
            if ah == 0 and dct is None:
                raise ValueError("JPEG Huffman table missing")
            bwn, bhn, stride = _noninterleaved_blocks(frame, geom, hf, vf)
            for by in range(bhn):
                for bx in range(bwn):
                    maybe_restart(reset_dc)
                    dc_one(0, ci, by * stride + bx, dct)
                    unit += 1
    else:  # AC scan: single component, non-interleaved (T.81 B.2.3)
        if len(idxs) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci, _td, ta = idxs[0]
        act = htables.get((1, ta))
        if act is None:
            raise ValueError("JPEG Huffman table missing")
        _cid, hf, vf, _tq = comps[ci]
        bwn, bhn, stride = _noninterleaved_blocks(frame, geom, hf, vf)
        eobrun = 0

        def reset_ac():
            nonlocal eobrun
            eobrun = 0

        block_fn = _prog_ac_first_block if ah == 0 else _prog_ac_refine_block
        for by in range(bhn):
            for bx in range(bwn):
                maybe_restart(reset_ac)
                eobrun = block_fn(
                    rd, act, coefzz[ci][by * stride + bx], ss, se, al,
                    eobrun,
                )
                unit += 1
    return _entropy_end(buf, start)


def _decode_jpeg_inner(buf: bytes) -> np.ndarray:
    if buf[:3] != JPEG_MAGIC[:3] or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG buffer")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, comps) comps = [(cid, hf, vf, tq)]
    progressive = False
    coefzz: list[np.ndarray] | None = None  # per comp (nblocks, 64) zigzag ints
    geom = None  # (hmax, vmax, mcux, mcuy)
    n_scans = 0
    restart_interval = 0
    scan = None

    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
        seg = buf[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                qtables[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_huffman(bits, vals)[1]
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (seq) / SOF2 (prog)
            if frame is not None:
                raise ValueError("multiple JPEG frames unsupported")
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM):
                raise ValueError(f"refusing JPEG dimensions {w}x{h}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            if not all(c[1] in (1, 2) and c[2] in (1, 2) for c in comps):
                raise ValueError("JPEG sampling factors beyond 2 unsupported")
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            geom = (hmax, vmax, mcux, mcuy)
            coefzz = [
                np.zeros((mcuy * vf * mcux * hf, 64), dtype=np.int32)
                for _cid, hf, vf, _tq in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "non-baseline JPEG (lossless/hierarchical/arith) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            if progressive:
                if frame is None or len(seg) < 1 + 2 * ns + 3:
                    raise ValueError("JPEG scan before frame header")
                n_scans += 1
                if n_scans > 512:
                    raise ValueError("too many JPEG scans")
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos = _decode_progressive_scan(
                    buf,
                    pos + seglen,
                    frame,
                    geom,
                    scan_comps,
                    ss,
                    se,
                    ahal >> 4,
                    ahal & 0x0F,
                    htables,
                    coefzz,
                    restart_interval,
                )
                continue
            scan = (scan_comps, pos + seglen)
            break
        # APPn/COM/etc: skip
        pos += seglen

    if frame is None or (scan is None and n_scans == 0):
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame
    hmax, vmax, mcux, mcuy = geom

    if scan is not None:  # sequential: one interleaved DC+AC scan
        scan_comps, data_start = scan
        if len(scan_comps) != len(comps):
            raise ValueError("JPEG partial scans unsupported")
        rd = _BitReader(buf[data_start:])
        preds = [0] * len(comps)
        mcu_count = 0
        rst_n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and \
                        mcu_count % restart_interval == 0:
                    rd.align_and_expect_rst(rst_n)
                    rst_n = (rst_n + 1) % 8
                    preds = [0] * len(comps)
                for ci, (cid, hf, vf, tq) in enumerate(comps):
                    matches = [s for s in scan_comps if s[0] == cid]
                    if not matches:  # corrupted scan header: component
                        # id mismatch must stay inside the ValueError
                        # contract
                        raise ValueError(
                            "JPEG scan/frame component mismatch"
                        )
                    sc = matches[0]
                    dct = htables.get((0, sc[1]))
                    act = htables.get((1, sc[2]))
                    if dct is None or act is None:
                        raise ValueError("JPEG Huffman table missing")
                    for dy in range(vf):
                        for dx in range(hf):
                            zz = np.zeros(64, dtype=np.int32)
                            size = rd.huff(dct)
                            preds[ci] += _extend(rd.read(size), size)
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = rd.huff(act)
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                if k > 63:
                                    raise ValueError(
                                        "JPEG AC index overflow"
                                    )
                                s = rs & 0x0F
                                zz[k] = _extend(rd.read(s), s)
                                k += 1
                            bi = (my * vf + dy) * (mcux * hf) + (
                                mx * hf + dx
                            )
                            coefzz[ci][bi] = zz
                mcu_count += 1

    # shared finish: dequantize + inverse DCT per component (all blocks
    # at once), then upsample — identical for sequential and
    # progressive frames, so a progressive stream of the same quantized
    # coefficients decodes bit-identically to its baseline twin (the
    # round-trip oracle test_jpegcodec relies on)
    planes = []
    for ci, (cid, hf, vf, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError("JPEG quant table missing")
        qt = qtables[tq]
        bw, bh = mcux * hf, mcuy * vf
        nat = np.zeros((bw * bh, 64), dtype=np.float64)
        nat[:, ZIGZAG] = coefzz[ci].astype(np.float64) * qt[ZIGZAG][None, :]
        spat = np.einsum(
            "ji,njk,kl->nil", _D, nat.reshape(-1, 8, 8), _D
        ) + 128.0
        plane = _deblockify(spat, bh * 8, bw * 8)
        if hf < hmax or vf < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vf, axis=0), hmax // hf, axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.floor(planes[0] + 0.5).clip(0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError("unsupported JPEG component count")
    return _ycbcr_to_bgr(np.stack(planes, axis=-1))
