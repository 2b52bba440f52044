"""Calibration ECE/MCE: the grid-aggregated Spark plan must agree
with a direct per-row Python reference computing the same pinned
integer spec (half-microunit confidences, B equal-width bins, floor
divisions). Oracle parity at sf0.01 is the driver/check_oracle gate.
"""

from __future__ import annotations

import math

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.ml_eval import (
    ECE_BINS,
    N_CLASSES,
    SCORE_SCALE,
    calibration_ece,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def test_matches_per_row_reference(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    rows = emb.select("label", "embedding").collect()
    want = {}
    for cls in range(N_CLASSES):
        bins = {}
        for r in rows:
            conf_h = (
                int(math.floor(float(r.embedding[cls]) * SCORE_SCALE))
                + SCORE_SCALE
            )
            b = min(ECE_BINS - 1, (conf_h * ECE_BINS) // (2 * SCORE_SCALE))
            n_b, pos_b, conf_b = bins.get(b, (0, 0, 0))
            bins[b] = (
                n_b + 1,
                pos_b + (1 if r.label == cls else 0),
                conf_b + conf_h,
            )
        n = sum(v[0] for v in bins.values())
        gap_sum = sum(
            abs(2 * SCORE_SCALE * p - c) for _, p, c in bins.values()
        )
        mce = max(
            abs(2 * SCORE_SCALE * p - c) // (2 * nb)
            for nb, p, c in bins.values()
        )
        want[cls] = (n, gap_sum // (2 * n), mce)
    got = {
        r["cls"]: (r["n"], r["ece_e6"], r["mce_e6"])
        for r in calibration_ece(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) == N_CLASSES
    # the declared confidence map is not a trained calibrator, so the
    # statistic should be visibly nonzero — vacuity guard
    assert any(e > 0 for _, e, _ in got.values())
