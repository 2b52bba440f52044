"""OD flow matrix (plans/spatial.py::od_flow_matrix): direct
recomputation at sf0.01 (the correctness-gate scale) and the pinned
empty result at smoke scale (the MIN_FLOW cut leaves no repeated cell
pair in 1k events — both engines must agree on empty, the
c4_line_filter lesson)."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.spatial import (
    HOT_CELL,
    MIN_FLOW,
    WORLD,
    _MOD,
    _MULT,
    od_flow_matrix,
)

SF01 = "/root/testdata/sf0.01"


def test_flows_match_direct_walk(spark):
    rows = od_flow_matrix(spark, SF01).collect()
    assert rows, "sf0.01 must carry repeated flows or the query is dead"
    base = duckdb.sql(
        f"""SELECT user_id, event_id
            FROM read_parquet('{SF01}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    def cell(eid: int) -> tuple[int, int]:
        h = (eid * _MULT) % _MOD
        return (h % WORLD) // HOT_CELL, ((h // WORLD) % WORLD) // HOT_CELL

    flows: dict = {}
    movers: dict = {}
    prev_user = prev_eid = None
    for u, e in base:
        if u == prev_user:
            k = (*cell(prev_eid), *cell(e))
            flows[k] = flows.get(k, 0) + 1
            movers.setdefault(k, set()).add(u)
        prev_user, prev_eid = u, e
    want = {k: v for k, v in flows.items() if v >= MIN_FLOW}
    got = {
        (r["from_x"], r["from_y"], r["to_x"], r["to_y"]): r for r in rows
    }
    assert set(got) == set(want)
    for k, r in got.items():
        assert r["n_transitions"] == want[k]
        assert r["n_movers"] == len(movers[k])
        assert r["cell_dist"] == max(abs(k[0] - k[2]), abs(k[1] - k[3]))


def test_smoke_scale_is_legitimately_empty(spark):
    assert od_flow_matrix(spark, "/root/testdata/sf0.001").count() == 0
