"""dp_noisy_counts: the Laplace pseudo-noise reproduces a pure-Python
reference of the same inverse-CDF construction exactly (per class),
and the noise magnitudes are distributed like Laplace(b=1/eps).
Oracle parity at sf0.01 is the driver/check_oracle gate.
"""

from __future__ import annotations

import math
import statistics

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pipeline_quality import (
    DP_ADD,
    DP_EPSILON,
    DP_MULT,
    _HASH_MOD,
    dp_noisy_counts,
)


def _ref_noise(key: str) -> float:
    h = 0
    for ch in key:
        h = (h * 31 + ord(ch)) % _HASH_MOD
    h = (h * DP_MULT + DP_ADD) % _HASH_MOD
    h = (h * DP_MULT + DP_ADD) % _HASH_MOD
    u = (h + 0.5) / _HASH_MOD
    b = 1.0 / DP_EPSILON
    return -b * math.copysign(1.0, u - 0.5) * math.log(1.0 - 2.0 * abs(u - 0.5))


def test_noise_matches_python_reference(spark, sf_dir):
    rows = dp_noisy_counts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = round(r["n_events"] + _ref_noise(f"{r['event_type']}|{r['day']}"), 6)
        assert r["noisy_count"] == want, (r["event_type"], r["day"])
        assert r["epsilon"] == DP_EPSILON
        # pseudo-noise is recomputable from the key (this test just
        # did), so the schema must say so until the CSPRNG swap
        assert r["mechanism"] == "laplace_pseudo"


def test_noise_distribution_is_laplace_shaped(spark, sf_dir):
    rows = dp_noisy_counts(spark, sf_dir).collect()
    mags = [abs(r["noisy_count"] - r["n_events"]) for r in rows]
    assert len(mags) >= 50
    # |Laplace(b)| is Exp(b): median = b*ln2 ~ 0.69 at eps=1
    med = statistics.median(mags)
    assert 0.3 < med < 1.6
    signs = [1 if r["noisy_count"] > r["n_events"] else -1 for r in rows]
    # roughly balanced signs (hash-uniform u)
    assert abs(sum(signs)) < len(signs) * 0.5
