"""Sketched 2-hop reach vs the exact anchor: per-site estimates must
sit within HLL error of the exact distinct counts, and the 1-hop
column (an exact degree count, no sketch) must match exactly. This
test is the correctness gate — the query has no SQL oracle (sketch
internals are engine-specific), so the driver records rows-only.
"""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.spatial import (
    spatial_two_hop_reach,
    spatial_two_hop_reach_approx,
)

# DataSketches HLL_4 lgK=12 RSE is ~1.6%; 5% absolute-relative bound
# leaves ~3 sigma of headroom while still catching any accounting bug
# (off-by-one self-handling would blow it on small neighborhoods)
REL_TOL = 0.05


def test_estimates_track_exact(spark):
    # sf0.01: the sf0.001 smoke site set has no edges (same scale
    # choice as test_two_hop_reach_matches_brute_force)
    sf = "/root/testdata/sf0.01"
    exact = {
        r["site"]: (r["n_1hop"], r["n_2hop"])
        for r in spatial_two_hop_reach(spark, sf).collect()
    }
    approx = {
        r["site"]: (r["n_1hop"], r["n_2hop_est"])
        for r in spatial_two_hop_reach_approx(spark, sf).collect()
    }
    assert set(approx) == set(exact)
    assert any(n2 > 0 for _, n2 in exact.values())
    for site, (n1, n2) in exact.items():
        a1, a2 = approx[site]
        assert a1 == n1, f"site {site}: exact degree {n1} != {a1}"
        tol = max(1, REL_TOL * n2)
        assert abs(a2 - n2) <= tol, f"site {site}: {a2} vs exact {n2}"
