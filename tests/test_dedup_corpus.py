"""Corpus-level dedup invariants (north-star dedup surface): the
df-capped candidate generator is a recall-bounded subset of the exact
quadratic answer with identical scores, and canonical selection keeps
exactly one document per near-dup cluster.

Reference anchor: the engine-side generalization of the reference's
only dedup-shaped operator, NMS greedy suppression (main.py:125) —
"keep one representative of each overlapping group" applied to text.
"""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.dedup import (
    dedup_keep_canonical,
    dedup_ngram_jaccard,
    dedup_ngram_jaccard_capped,
)


def test_capped_is_subset_with_exact_scores(spark, sf_dir):
    exact = {
        (r.ia, r.ib): r.jaccard
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    capped = {
        (r.ia, r.ib): r.jaccard
        for r in dedup_ngram_jaccard_capped(spark, sf_dir).collect()
    }
    assert set(capped) <= set(exact)
    for pair, j in capped.items():
        # scores are computed on FULL shingle sets — identical, not approximate
        assert j == exact[pair]
    # the cap only drops stopword-shingle-only pairs; at this corpus it
    # should retain the overwhelming majority of true near-dup pairs
    assert len(capped) >= 0.8 * len(exact)


def test_keep_canonical_one_per_cluster(spark, sf_dir):
    rows = dedup_keep_canonical(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs  # every document is accounted for
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        kept = [r for r in members if r.keep]
        assert len(kept) == 1  # exactly one canonical per cluster
        assert cid == min(r.doc_id for r in members)  # min-id labeling
    # singletons keep themselves
    singles = [ms[0] for ms in by_cluster.values() if len(ms) == 1]
    assert all(r.keep for r in singles)
