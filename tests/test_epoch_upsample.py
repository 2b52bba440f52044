"""epoch_upsample: Python reference for the band/copy arithmetic,
injectivity of the training-order key, and the epoch-interleaving
property (replicas of one doc are far apart in key space).
"""

from __future__ import annotations

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.training_data import (
    EPOCH_HI_COPIES,
    EPOCH_HI_E6,
    EPOCH_MID_COPIES,
    EPOCH_MID_E6,
    HASH_P,
    PRIORITY_MULT,
    epoch_upsample,
)

SF = "/root/testdata/sf0.001"


def _quality_e6(text: str) -> int:
    toks = text.strip().split(" ")
    n = len(toks)
    sw = sum(1 for t in toks if t in ("the", "a"))
    q = round(min(n / 50.0, 1.0) * (1.0 - sw / n), 6)
    return round(q * 1_000_000)


def test_epoch_upsample_matches_reference(spark, sf_dir):
    con = duckdb.connect()
    base = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    rows = [
        (r["doc_id"], r["q_e6"], r["n_copies"], r["copy_idx"], r["shuffle_key"])
        for r in epoch_upsample(spark, SF).collect()
    ]
    by_doc: dict[int, list] = {}
    for d, q, n, c, k in rows:
        by_doc.setdefault(d, []).append((q, n, c, k))
    assert set(by_doc) == {d for d, _ in base}
    for doc_id, text in base:
        q_e6 = _quality_e6(text)
        want_n = (
            EPOCH_HI_COPIES
            if q_e6 >= EPOCH_HI_E6
            else EPOCH_MID_COPIES if q_e6 >= EPOCH_MID_E6 else 1
        )
        got = sorted(by_doc[doc_id], key=lambda t: t[2])
        assert len(got) == want_n
        for i, (q, n, c, k) in enumerate(got, start=1):
            assert (q, n, c) == (q_e6, want_n, i)
            assert k == (doc_id % HASH_P * 1000 + i) % HASH_P * PRIORITY_MULT % HASH_P
    # bands must discriminate on the corpus
    assert {n for _, _, n, _, _ in rows} == {1, EPOCH_MID_COPIES, EPOCH_HI_COPIES}


def test_shuffle_key_injective_and_interleaving(spark, sf_dir):
    rows = epoch_upsample(spark, SF).collect()
    keys = [r["shuffle_key"] for r in rows]
    assert len(keys) == len(set(keys)), "order key must be injective"
    # epoch-interleaving: order by key, replicas of one doc should not
    # be adjacent (a lattice-degenerate hash would cluster them)
    ordered = [r["doc_id"] for r in sorted(rows, key=lambda r: r["shuffle_key"])]
    adjacent_same = sum(
        1 for a, b in zip(ordered, ordered[1:]) if a == b
    )
    assert adjacent_same <= len(ordered) // 50
