"""matryoshka_recall (plans/similarity.py): dimension-truncation
recall audit invariants the SQL oracle can't express."""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.similarity import (
    KNN_BATCH_QUERIES,
    MATRYOSHKA_K,
    matryoshka_recall,
)


def test_matryoshka_recall_invariants(spark, sf_dir):
    rows = matryoshka_recall(spark, sf_dir).collect()
    assert len(rows) == KNN_BATCH_QUERIES
    for r in rows:
        assert 0 <= r.overlap <= MATRYOSHKA_K
        assert r.recall_ppm == r.overlap * 1_000_000 // MATRYOSHKA_K
    # random projections to half the dims keep SOME of the top-k:
    # total overlap must be neither zero nor perfect across 8 queries
    total = sum(r.overlap for r in rows)
    assert 0 < total < KNN_BATCH_QUERIES * MATRYOSHKA_K
