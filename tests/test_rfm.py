"""RFM segmentation (plans/stats.py::rfm_segments): direct
recomputation of scores against numpy-free quantile interpolation."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.stats import (
    rfm_segments,
)

SF = "/root/testdata/sf0.001"


def _quantile(sorted_vals: list[int], p: float) -> float:
    """Linear interpolation on (n-1)p — the percentile/quantile_cont
    definition both engines share."""
    h = (len(sorted_vals) - 1) * p
    lo = int(h)
    frac = h - lo
    if lo + 1 >= len(sorted_vals):
        return float(sorted_vals[-1])
    return sorted_vals[lo] + frac * (sorted_vals[lo + 1] - sorted_vals[lo])


def test_rfm_scores_match_direct(spark):
    rows = {r["user_id"]: r for r in rfm_segments(spark, SF).collect()}
    base = duckdb.sql(
        f"""SELECT user_id,
                   date_diff('day',
                             CAST(date_trunc('day', max(ts)) AS DATE),
                             (SELECT CAST(date_trunc('day', max(ts)) AS DATE)
                              FROM read_parquet('{SF}/events.parquet'))),
                   count(*),
                   CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF}/events.parquet') GROUP BY user_id"""
    ).fetchall()
    rfm = {u: (int(r), int(f), int(m)) for u, r, f, m in base}
    dims = list(zip(*rfm.values()))
    cuts = [
        [_quantile(sorted(d), p) for p in (0.2, 0.4, 0.6, 0.8)] for d in dims
    ]
    assert set(rows) == set(rfm)
    seen_segments = set()
    for u, (rec, freq, mon) in rfm.items():
        r_score = 1 + sum(rec < c for c in cuts[0])
        f_score = 1 + sum(freq > c for c in cuts[1])
        m_score = 1 + sum(mon > c for c in cuts[2])
        row = rows[u]
        assert (row["recency_days"], row["frequency"], row["monetary_cents"]) == (
            rec,
            freq,
            mon,
        )
        assert (row["r_score"], row["f_score"], row["m_score"]) == (
            r_score,
            f_score,
            m_score,
        ), u
        assert row["segment"] == f"{r_score}{f_score}{m_score}"
        seen_segments.add(row["segment"])
    # quintiles must genuinely spread the population
    assert len(seen_segments) >= 5
