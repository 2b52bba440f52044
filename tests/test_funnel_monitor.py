"""Streaming funnel monitor (streaming/funnel_monitor.py): stage
counts ≡ the batch funnel over the ts-ordered replay, at-most-3-rows
per user, monotone stages, and the documented out-of-order divergence."""

from __future__ import annotations

import datetime as dt
import os

from conftest import events_chunk_schema, write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.relational import (
    funnel_conversion,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.funnel_monitor import (
    streaming_funnel_monitor,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    run_to_memory,
    stream_events,
)


def test_stream_stage_counts_match_batch_funnel(spark, sf_dir):
    q = run_to_memory(
        streaming_funnel_monitor(stream_events(spark, sf_dir)), "funnel_out"
    )
    try:
        rows = spark.table("funnel_out").collect()
    finally:
        q.stop()
    # per-user at most one row per stage, stages strictly increasing in ts
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["stage_ord"])
        assert [r["stage_ord"] for r in rs] == list(range(1, len(rs) + 1))
        ts = [r["ts_us"] for r in rs]
        assert ts == sorted(ts) and len(set(ts)) == len(ts)
    got_counts = {
        s: sum(1 for r in rows if r["stage_ord"] == s) for s in (1, 2, 3)
    }
    want = {
        r["stage_ord"]: r["n_users"]
        for r in funnel_conversion(spark, sf_dir).collect()
    }
    assert got_counts == want
    assert want[3] > 0, "no full conversions — parity is weak evidence"


T0 = dt.datetime(2024, 1, 1)


def test_out_of_order_arrival_is_greedy_and_never_regresses(spark, tmp_path):
    """Arrival order defines the streaming funnel: a click that arrives
    late (but with an earlier event time than the one already taken)
    does NOT rewrite the machine — the batch query, seeing everything
    at once, would pick the earlier click. This pins the documented
    divergence instead of leaving it implicit."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    m = dt.timedelta
    # chunk 1: view@0m, click@30m  -> stage 2 taken at 30m
    write_events_chunk(
        spark,
        src,
        "f1",
        [(1, 1, 300.0, T0), (1, 2, 100.0, T0 + m(minutes=30))],
    )
    # chunk 2: LATE click@10m (earlier event time), purchase@20m —
    # the machine is at stage 2 since 30m, so a 20m purchase must NOT
    # convert (strictly-after rule vs the TAKEN click), and the 10m
    # click must not replace the taken one
    write_events_chunk(
        spark,
        src,
        "f2",
        [(1, 3, 100.0, T0 + m(minutes=10)), (1, 4, 200.0, T0 + m(minutes=20))],
    )
    # chunk 3: purchase@50m -> converts
    write_events_chunk(
        spark, src, "f3", [(1, 5, 200.0, T0 + m(minutes=50))]
    )
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(events_chunk_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn(
            "event_type",
            F.when(F.col("value") >= 300, "view")
            .when(F.col("value") >= 200, "purchase")
            .otherwise("click"),
        )
    )
    q = run_to_memory(streaming_funnel_monitor(stream), "funnel_ooo")
    try:
        rows = sorted(
            (r["stage_ord"], r["stage"], r["ts_us"])
            for r in spark.table("funnel_ooo").collect()
        )
    finally:
        q.stop()
    us = lambda minutes: int((T0 + m(minutes=minutes)).timestamp()) * 1_000_000  # noqa: E731
    assert rows == [
        (1, "view", us(0)),
        (2, "click", us(30)),   # the taken click, not the late 10m one
        (3, "purchase", us(50)),  # 20m purchase correctly rejected
    ]
