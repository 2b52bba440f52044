"""Codec-parity registry queries (plans/codec_parity.py): the real
PNG/WAV codecs inside the oracle hash, plus the dHash invariants the
SQL oracle can't see (that the hash really came from decoded bytes)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.codec_parity import (
    HAMMING_MAX,
    _audio_samples,
    _dhash_bands,
    _image_pixels,
    _pcm_features,
    audio_pcm_features,
    image_dhash_neardup,
)


def _dhash_reference(gray: np.ndarray) -> list[int]:
    """Bands straight from formula pixels — no codec in the loop."""
    g = gray.astype(np.int64)
    bits = (g[:, 1:] > g[:, :-1]).astype(np.int64).reshape(-1)
    return [
        int(sum(int(bits[i * 16 + j]) << j for j in range(16)))
        for i in range(4)
    ]


def test_dhash_worker_matches_codec_free_reference():
    # the worker's PNG encode->decode must be pixel-lossless: its bands
    # equal the bands computed from the raw formula pixels
    pdf = pd.DataFrame({"doc_id": list(range(40)) + [1_000_003, 77_777]})
    (out,) = list(_dhash_bands(iter([pdf])))
    for _, row in out.iterrows():
        ref = _dhash_reference(_image_pixels(int(row["doc_id"])))
        got = [int(row[f"b{i}"]) for i in range(4)]
        assert got == ref, f"doc {row['doc_id']}: {got} != {ref}"
        assert all(0 <= b < (1 << 16) for b in got)


def test_family_variants_are_neardups():
    # all 6 intra-family pairs stay within the Hamming cut
    for fam in (0, 3, 11, 123):
        bands = [
            _dhash_reference(_image_pixels(4 * fam + v)) for v in range(4)
        ]
        for i in range(4):
            for j in range(i + 1, 4):
                ham = sum(
                    bin(a ^ b).count("1")
                    for a, b in zip(bands[i], bands[j])
                )
                assert ham <= HAMMING_MAX, (fam, i, j, ham)


def test_pcm_worker_matches_formula():
    pdf = pd.DataFrame({"doc_id": [0, 1, 56, 57, 999_999]})
    (out,) = list(_pcm_features(iter([pdf])))
    for _, row in out.iterrows():
        s = _audio_samples(int(row["doc_id"]))
        assert int(row["n_samples"]) == s.size
        assert int(row["zero_crossings"]) == int(np.sum(s[:-1] * s[1:] < 0))
        assert int(row["abs_sum"]) == int(np.sum(np.abs(s)))
        assert int(row["peak"]) == int(np.max(np.abs(s)))


def test_image_dhash_neardup_smoke(spark, sf_dir):
    rows = image_dhash_neardup(spark, sf_dir).collect()
    assert rows, "sf0.001 must produce in-family near-dup pairs"
    assert all(r.doc_a < r.doc_b and r.hamming <= HAMMING_MAX for r in rows)
    # every intra-family pair present (2 perturbed pixels can't push
    # Hamming past 4 flips, and >=1 of 4 bands must then be clean)
    fams: dict[int, list[int]] = {}
    for r in rows:
        if r.doc_a // 4 == r.doc_b // 4:
            fams.setdefault(r.doc_a // 4, []).append((r.doc_a, r.doc_b))
    assert all(len(v) == 6 for v in fams.values())


def test_audio_pcm_features_smoke(spark, sf_dir):
    rows = audio_pcm_features(spark, sf_dir).collect()
    assert rows
    assert all(
        200 <= r.n_samples <= 256 and 0 < r.peak <= 1024 for r in rows
    )
