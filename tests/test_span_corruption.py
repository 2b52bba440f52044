"""span_corruption: Python reference for the aligned-grid spec,
non-overlap guarantee, truncated final slot, and exact realized-rate
arithmetic.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.training_data import (
    HASH_P,
    SELECT_MULT,
    SPAN_LEN,
    SPAN_RATE_MOD,
    span_corruption,
)

SF = "/root/testdata/sf0.001"


def _reference(doc_id: int, n_tok: int) -> list[tuple[int, int]]:
    spans = []
    for slot in range(math.ceil(n_tok / SPAN_LEN)):
        h = (doc_id * 10007 + slot) % HASH_P * SELECT_MULT % HASH_P
        if h % SPAN_RATE_MOD == 0:
            start = slot * SPAN_LEN
            spans.append((start, min(SPAN_LEN, n_tok - start)))
    return spans


def test_span_corruption_matches_reference(spark, sf_dir):
    con = duckdb.connect()
    base = con.sql(
        "SELECT doc_id, len(string_split(trim(text), ' '))"
        f" FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    rows: dict[int, list] = {}
    for r in span_corruption(spark, SF).collect():
        rows.setdefault(r["doc_id"], []).append(
            (r["mask_id"], r["span_start"], r["span_len"], r["corrupt_rate_e6"])
        )
    for doc_id, n_tok in base:
        want = _reference(doc_id, n_tok)
        got = sorted(rows.get(doc_id, []))
        assert len(got) == len(want)
        total = sum(sl for _, sl in want)
        for mask_id, (w, g) in enumerate(zip(want, got)):
            assert g == (mask_id, w[0], w[1], (1_000_000 * total) // n_tok)
        # non-overlap + in-bounds: aligned slots guarantee both
        ends = [s + sl for s, sl in want]
        starts = [s for s, _ in want]
        assert all(e <= n_tok for e in ends)
        assert all(a >= b for a, b in zip(starts[1:], ends[:-1]))


def test_corpus_rate_near_target(spark, sf_dir):
    """The 1-in-7 aligned-slot rate lands near 1/7 of tokens corpus-wide
    (truncated final slots pull it slightly under)."""
    con = duckdb.connect()
    n_total = con.sql(
        "SELECT sum(len(string_split(trim(text), ' ')))"
        f" FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    corrupted = sum(
        r["span_len"] for r in span_corruption(spark, SF).collect()
    )
    rate = corrupted / n_total
    assert 0.10 < rate < 0.20
