"""Streaming OD tracker (streaming/od_tracker.py): the emitted edge
set over the ts-ordered replay equals the batch lag chain, and the
aggregated flows reproduce od_flow_matrix exactly."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.spatial import (
    MIN_FLOW,
    od_flow_matrix,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.od_tracker import (
    cell_of,
    streaming_od_tracker,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    run_to_memory,
    stream_events,
)


def test_stream_edges_equal_batch_lag_chain(spark, sf_dir):
    q = run_to_memory(
        streaming_od_tracker(stream_events(spark, sf_dir)), "od_out"
    )
    try:
        got = sorted(
            (r.user_id, r.from_x, r.from_y, r.to_x, r.to_y)
            for r in spark.table("od_out").collect()
        )
    finally:
        q.stop()
    base = duckdb.sql(
        f"""SELECT user_id, event_id
            FROM read_parquet('{sf_dir}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    want = []
    prev_user = prev_eid = None
    for u, e in base:
        if u == prev_user:
            want.append((u, *cell_of(prev_eid), *cell_of(e)))
        prev_user, prev_eid = u, e
    assert got == sorted(want)
    assert got, "no movement edges — parity is vacuous"


def test_aggregated_stream_edges_reproduce_batch_flows(spark):
    sf = "/root/testdata/sf0.01"  # the scale where flows clear MIN_FLOW
    q = run_to_memory(streaming_od_tracker(stream_events(spark, sf)), "od_agg")
    try:
        rows = spark.table("od_agg").collect()
    finally:
        q.stop()
    flows: dict = {}
    movers: dict = {}
    for r in rows:
        k = (r.from_x, r.from_y, r.to_x, r.to_y)
        flows[k] = flows.get(k, 0) + 1
        movers.setdefault(k, set()).add(r.user_id)
    want = {
        (r["from_x"], r["from_y"], r["to_x"], r["to_y"]): (
            r["n_transitions"],
            r["n_movers"],
        )
        for r in od_flow_matrix(spark, sf).collect()
    }
    got = {
        k: (n, len(movers[k]))
        for k, n in flows.items()
        if n >= MIN_FLOW
    }
    assert got == want and want
