"""Independence audit (plans/stats.py::independence_audit): direct
recomputation plus the deviation conservation identity (Σ dev = 0 over
any margin — cross-multiplied deviations cancel exactly)."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.stats import (
    independence_audit,
)

SF = "/root/testdata/sf0.001"


def test_deviation_cells_match_direct(spark):
    rows = independence_audit(spark, SF).collect()
    base = duckdb.sql(
        f"SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    cells: dict = {}
    n_i: dict = {}
    n_j: dict = {}
    for et, h in base:
        cells[(et, h)] = cells.get((et, h), 0) + 1
        n_i[et] = n_i.get(et, 0) + 1
        n_j[h] = n_j.get(h, 0) + 1
    n_all = len(base)
    assert len(rows) == len(cells)
    for r in rows:
        k = (r["event_type"], r["h"])
        assert r["n_ij"] == cells[k]
        assert (r["n_i"], r["n_j"]) == (n_i[k[0]], n_j[k[1]])
        assert r["dev"] == n_all * cells[k] - n_i[k[0]] * n_j[k[1]]
        assert r["ratio_e6"] == (1_000_000 * n_all * cells[k]) // (
            n_i[k[0]] * n_j[k[1]]
        )
    # conservation: deviations cancel over each type's row (only for
    # types observed in EVERY hour — absent cells carry negative dev
    # that the sparse output omits by construction)
    for et in n_i:
        if sum(1 for (a, _h) in cells if a == et) == len(n_j):
            assert sum(r["dev"] for r in rows if r["event_type"] == et) == 0
    assert any(r["dev"] > 0 for r in rows) and any(r["dev"] < 0 for r in rows)
