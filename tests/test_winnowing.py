"""Winnowing fingerprint selection (Schleimer et al., SIGMOD 2003).

Pins the algorithm's published guarantees on crafted documents:

1. match guarantee — any two docs sharing a substring of length
   ≥ K+W-1 share at least one selected fingerprint hash;
2. density guarantee — consecutive selected positions are never more
   than W grams apart (every window contains a selection);
3. rightmost tie-break — uniform text selects the rightmost gram of
   every window, pinning the (hash, position) packing order;
4. short docs (< W grams) yield exactly one fingerprint;
5. noise threshold — docs with no common K-gram share no fingerprint.
"""

from __future__ import annotations

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.dedup import (
    WINNOW_K,
    WINNOW_W,
    _winnow_selected,
)


def _select(spark, docs: dict[int, str]):
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], ["doc_id", "text"]
    )
    rows = _winnow_selected(df).collect()
    out: dict[int, list] = {k: [] for k in docs}
    for r in rows:
        out[r.doc_id].append((r.pos, r.fp_hash))
    return {k: sorted(v) for k, v in out.items()}


GUARANTEE_LEN = WINNOW_K + WINNOW_W - 1  # 11 chars with K=8, W=4


def test_match_guarantee(spark):
    # the shared span is exactly the guarantee length, embedded at
    # different offsets inside otherwise-disjoint text
    shared = "qwertzuiopa"
    assert len(shared) == GUARANTEE_LEN
    sel = _select(
        spark,
        {
            1: "xxxxxxx" + shared + "yyyyyyyyy",
            2: "mmmmmmmmmmmmmm" + shared + "nn",
        },
    )
    h1 = {h for _, h in sel[1]}
    h2 = {h for _, h in sel[2]}
    assert h1 & h2, "docs sharing a ≥K+W-1 span must share a fingerprint"


def test_density_guarantee(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    sel = _select(spark, {1: text})
    pos = sorted(p for p, _ in sel[1])
    assert pos, "non-trivial doc selects at least one fingerprint"
    n_grams = len(text) - WINNOW_K + 1
    # first selection within the first window, last within the last
    assert pos[0] <= WINNOW_W
    assert pos[-1] > n_grams - WINNOW_W
    for a, b in zip(pos, pos[1:]):
        assert b - a <= WINNOW_W, "a window passed with no selection"
    # sampling actually thins: fewer fingerprints than grams
    assert len(pos) < n_grams


def test_rightmost_tiebreak_uniform_text(spark):
    n = 20
    sel = _select(spark, {1: "a" * n})
    n_grams = n - WINNOW_K + 1
    # all gram hashes equal → rightmost of each window wins → every
    # full-window end position is selected
    assert sorted(p for p, _ in sel[1]) == list(range(WINNOW_W, n_grams + 1))


def test_short_doc_single_fingerprint(spark):
    # K ≤ len < K+W-1: fewer than W grams → one partial window → one pick
    sel = _select(spark, {1: "abcdefghi"})  # 9 chars → 2 grams < W
    assert len(sel[1]) == 1
    # below the noise threshold: no grams at all
    sel2 = _select(spark, {1: "abc"})
    assert sel2[1] == []


def test_noise_threshold_disjoint_docs(spark):
    # no common 8-char substring → no shared fingerprint
    sel = _select(
        spark,
        {1: "abcdefghijklmnopqrst", 2: "ABCDEFGHIJKLMNOPQRST"},
    )
    h1 = {h for _, h in sel[1]}
    h2 = {h for _, h in sel[2]}
    assert h1 and h2 and not (h1 & h2)


def test_positions_are_valid_gram_offsets(spark):
    text = "some moderately long test document body for offsets"
    sel = _select(spark, {1: text})
    n_grams = len(text) - WINNOW_K + 1
    for p, h in sel[1]:
        assert 1 <= p <= n_grams
        assert h >= 0
