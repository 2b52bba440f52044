"""Cohort LTV triangle and inter-arrival burstiness — direct Python
recomputation plus each query's conservation identity."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.relational import (
    cohort_ltv_triangle,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
    interarrival_burstiness,
)

SF = "/root/testdata/sf0.001"


def test_ltv_triangle_matches_direct(spark):
    rows = cohort_ltv_triangle(spark, SF).collect()
    base = duckdb.sql(
        f"""SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(round(value * 100) AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    first = {}
    for u, d, _ in base:
        if u not in first or d < first[u]:
            first[u] = d
    sizes: dict = {}
    for u, d in first.items():
        sizes[d] = sizes.get(d, 0) + 1
    cells: dict = {}
    actives: dict = {}
    for u, d, c in base:
        k = (first[u], (d - first[u]).days // 7)
        cells[k] = cells.get(k, 0) + c
        actives.setdefault(k, set()).add(u)
    assert len(rows) == len(cells)
    got = {(r["cohort_day"], r["age_week"]): r for r in rows}
    for (cd, aw), cents in cells.items():
        r = got[(cd.strftime("%Y-%m-%d"), aw)]
        assert r["revenue_cents"] == cents
        assert r["active_users"] == len(actives[(cd, aw)])
        assert r["cohort_size"] == sizes[cd]
        cum = sum(v for (c2, a2), v in cells.items() if c2 == cd and a2 <= aw)
        assert r["cum_cents"] == cum
        assert r["ltv_per_user_e6"] == (1_000_000 * cum) // sizes[cd]
    # conservation: triangle cells re-add to the table total
    assert sum(r["revenue_cents"] for r in rows) == sum(c for _, _, c in base)


def test_burstiness_matches_direct(spark):
    got = {
        r["event_type"]: r for r in interarrival_burstiness(spark, SF).collect()
    }
    base = duckdb.sql(
        f"""SELECT event_type, epoch_us(ts) // 1000000 AS t
            FROM read_parquet('{SF}/events.parquet')
            ORDER BY event_type, ts, event_id"""
    ).fetchall()
    by: dict = {}
    for et, t in base:
        by.setdefault(et, []).append(int(t))
    for et, ts in by.items():
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        n, s, q = len(gaps), sum(gaps), sum(g * g for g in gaps)
        r = got[et]
        assert (r["n_gaps"], r["span_s"], r["sum_sq"], r["max_gap_s"]) == (
            n,
            s,
            q,
            max(gaps),
        )
        # telescoping: the gap sum IS last - first
        assert s == ts[-1] - ts[0]
        assert r["mean_gap_ms"] == (1000 * s) // n
        assert r["cv2_e6"] == (1_000_000 * (n * q - s * s)) // (s * s)
        # near-Poisson synthetic traffic: CV^2 should sit near 1
        assert 100_000 < r["cv2_e6"] < 10_000_000
