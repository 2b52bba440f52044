"""Revenue Gini / Lorenz (plans/stats.py::revenue_gini): direct
recomputation plus the float-reference sanity of the rank formula and
the three-step long-division trick."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.stats import (
    revenue_gini,
)

SF = "/root/testdata/sf0.001"


def _floor_e6(num: int, den: int) -> int:
    return (1_000_000 * num) // den  # python ints don't overflow


def test_gini_matches_direct_and_float_reference(spark):
    got = {r["event_type"]: r for r in revenue_gini(spark, SF).collect()}
    base = duckdb.sql(
        f"SELECT event_type, event_id, CAST(round(value*100) AS BIGINT) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    by: dict[str, list[tuple[int, int]]] = {}
    for et, eid, c in base:
        by.setdefault(et, []).append((c, eid))
    for et, vals in by.items():
        vals.sort()  # (cents, event_id) — the query's exact order
        n = len(vals)
        s = sum(c for c, _ in vals)
        rank_weighted = sum(i * c for i, (c, _) in enumerate(vals, 1))
        num = 2 * rank_weighted - (n + 1) * s
        r = got[et]
        assert (r["n"], r["total_cents"]) == (n, s)
        assert r["gini_e6"] == _floor_e6(num, n * s)
        top = sum(c for c, _ in vals[n - n // 10 :]) if n // 10 else None
        assert r["top10_share_e6"] == _floor_e6(top, s)
        # float reference: mean absolute difference form of Gini
        xs = [c for c, _ in vals]
        mad = sum(abs(a - b) for a in xs[:200] for b in xs[:200])
        gini_float = mad / (2 * 200 * 200 * (sum(xs[:200]) / 200))
        # the 200-row subsample approximates the same statistic — only a
        # sanity band, the exact check above is the real assertion
        assert abs(r["gini_e6"] / 1e6 - gini_float) < 0.15
        # Lorenz ordering invariants
        assert 0 <= r["gini_e6"] <= 1_000_000
        assert r["top10_share_e6"] >= 1_000_000 * (n // 10) // n  # >= uniform
