"""Crawl budget apportionment (plans/crawl.py): Hamilton largest-
remainder invariants — exact budget conservation, quota monotonicity,
and a direct recomputation."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.crawl import (
    CRAWL_BUDGET,
    crawl_budget_allocation,
)

SF = "/root/testdata/sf0.001"


def test_hamilton_apportionment(spark):
    rows = {r["source"]: r for r in crawl_budget_allocation(spark, SF).collect()}
    base = duckdb.sql(
        f"SELECT source, count(*) FROM read_parquet('{SF}/documents.parquet') "
        f"GROUP BY source"
    ).fetchall()
    counts = dict(base)
    n_total = sum(counts.values())
    floors = {s: (CRAWL_BUDGET * n) // n_total for s, n in counts.items()}
    rems = {s: (CRAWL_BUDGET * n) % n_total for s, n in counts.items()}
    leftover = CRAWL_BUDGET - sum(floors.values())
    order = sorted(counts, key=lambda s: (-rems[s], s))
    want = {
        s: floors[s] + (1 if i < leftover else 0)
        for i, s in enumerate(order)
    }
    assert set(rows) == set(counts)
    for s, r in rows.items():
        assert (r["n_docs"], r["floor_share"], r["remainder"]) == (
            counts[s],
            floors[s],
            rems[s],
        )
        assert r["allocated"] == want[s]
    # conservation: not one slot lost or invented
    assert sum(r["allocated"] for r in rows.values()) == CRAWL_BUDGET
    # quota rule: every allocation is floor(quota) or floor(quota)+1
    assert all(
        r["allocated"] - r["floor_share"] in (0, 1) for r in rows.values()
    )
    assert 0 < leftover < len(counts), "tie-break path unexercised"
