"""nDCG@k: the histogram-prefiltered Spark plan must agree with a
direct full-sort Python reference computing the same pinned
fixed-point spec (integer e6 discounts, ties on score_fp DESC /
vec_id ASC). Oracle parity at sf0.01 is the driver/check_oracle gate;
this test guards the prefilter's top-k equivalence independently.
"""

from __future__ import annotations

import math

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.ml_eval import (
    NDCG_K,
    N_CLASSES,
    SCORE_SCALE,
    _NDCG_DISCOUNTS_E6,
    _NDCG_IDCG_E6,
    ndcg_at_k,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def test_discount_constants_pinned():
    # the literals are what both engines consume — assert they really
    # are floor(1e6 / log2(i+1)) and that prefix sums line up
    for i, d in enumerate(_NDCG_DISCOUNTS_E6, start=1):
        assert d == int(1_000_000 // math.log2(i + 1))
    assert _NDCG_IDCG_E6[0] == _NDCG_DISCOUNTS_E6[0] == 1_000_000
    for m in range(1, NDCG_K):
        assert (
            _NDCG_IDCG_E6[m] == _NDCG_IDCG_E6[m - 1] + _NDCG_DISCOUNTS_E6[m]
        )


def test_matches_full_sort_reference(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    rows = emb.select("vec_id", "label", "embedding").collect()
    want = {}
    for cls in range(N_CLASSES):
        scored = sorted(
            (
                (
                    -int(math.floor(float(r.embedding[cls]) * SCORE_SCALE)),
                    r.vec_id,
                    1 if r.label == cls else 0,
                )
                for r in rows
            )
        )
        n_pos = sum(p for _, _, p in scored)
        dcg = sum(
            p * _NDCG_DISCOUNTS_E6[i]
            for i, (_, _, p) in enumerate(scored[:NDCG_K])
        )
        idcg = _NDCG_IDCG_E6[min(NDCG_K, n_pos) - 1]
        want[cls] = (n_pos, dcg, (1_000_000 * dcg) // idcg)
    got = {
        r["cls"]: (r["n_pos"], r["dcg_e6"], r["ndcg_e6"])
        for r in ndcg_at_k(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) == N_CLASSES
