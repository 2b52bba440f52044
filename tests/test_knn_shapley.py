"""Exact KNN-Shapley: the window-suffix-sum plan must agree with a
direct Python implementation of the Jia et al. backward recurrence on
the same pinned integer spec, and satisfy the Shapley efficiency
axiom (Σᵢ sᵢ = utility of the full corpus) up to per-term floor error.
Oracle parity at sf0.01 is the driver/check_oracle gate.
"""

from __future__ import annotations

import math

import numpy as np

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.similarity import (
    KNN_BATCH_QUERIES,
    KNN_SHAPLEY_K,
    SHAP_SCALE,
    knn_shapley,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def _reference(rows):
    """Per-query backward recurrence on the pinned integer spec."""
    qs = sorted(
        (r for r in rows if r.vec_id < KNN_BATCH_QUERIES),
        key=lambda r: r.vec_id,
    )
    corpus = [r for r in rows if r.vec_id >= KNN_BATCH_QUERIES]
    want = {}
    for q in qs:
        qv = np.asarray(list(q.embedding), float)
        ranked = sorted(
            corpus,
            key=lambda r: (
                -round(
                    float(
                        np.dot(list(r.embedding), qv)
                        / (np.linalg.norm(list(r.embedding)) * np.linalg.norm(qv))
                    ),
                    6,
                ),
                r.vec_id,
            ),
        )
        n = len(ranked)
        m = [1 if r.label == q.label else 0 for r in ranked]
        s = [0] * n
        s[n - 1] = m[n - 1] * (SHAP_SCALE // max(KNN_SHAPLEY_K, n))
        for i in range(n - 2, -1, -1):
            qpos = (SHAP_SCALE * min(KNN_SHAPLEY_K, i + 1)) // (
                KNN_SHAPLEY_K * (i + 1)
            )
            s[i] = s[i + 1] + (m[i] - m[i + 1]) * qpos
        for i, r in enumerate(ranked):
            want[(q.vec_id, r.vec_id)] = (i + 1, s[i])
    return want, qs, corpus


def test_matches_backward_recurrence(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    rows = emb.select("vec_id", "label", "embedding").collect()
    want, _, corpus = _reference(rows)
    got = {
        (r["qid"], r["vec_id"]): (r["rn"], r["shap_e9"])
        for r in knn_shapley(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) == KNN_BATCH_QUERIES * len(corpus)


def test_efficiency_axiom(spark, sf_dir):
    """Σᵢ sᵢ = utility(full corpus) = matching fraction of the K
    nearest. Each floored term loses < 1 e-9 unit and s_i suffix-sums
    up to N−i of them, so the corpus total carries < N(N+1)/2 units of
    accumulated floor error (≈ 1.2e5 of 1e9 at sf0.001 — still 5
    orders below the 1/K value granularity the axiom is checked at)."""
    emb = load_table(spark, "embeddings", sf_dir)
    rows = emb.select("vec_id", "label", "embedding").collect()
    want, qs, corpus = _reference(rows)
    n = len(corpus)
    per_q_sum = {}
    for (qid, _), (_, s) in want.items():
        per_q_sum[qid] = per_q_sum.get(qid, 0) + s
    labels = {r.vec_id: r.label for r in rows}
    for q in qs:
        by_rank = sorted(
            (rn, vid)
            for (qid, vid), (rn, _) in want.items()
            if qid == q.vec_id
        )
        m_top = sum(
            1
            for _, vid in by_rank[:KNN_SHAPLEY_K]
            if labels[vid] == q.label
        )
        exact_e9 = (m_top * SHAP_SCALE) / KNN_SHAPLEY_K
        tol = n * (n + 1) // 2 + KNN_SHAPLEY_K
        assert abs(per_q_sum[q.vec_id] - exact_e9) <= tol
        assert tol < SHAP_SCALE / KNN_SHAPLEY_K / 100  # bound is meaningful
