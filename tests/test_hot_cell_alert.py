"""Streaming hot-cell alerts (streaming/hot_cell_alert.py): the alert
set equals the batch hot set, exactly once per (cell, window)."""

from __future__ import annotations

from datetime import datetime, timezone

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.crowd_density import (
    STREAM_HOT_MIN,
    batch_crowd_density,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.hot_cell_alert import (
    DAY_MS,
    streaming_hot_cell_alerts,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    run_to_memory,
    stream_events,
)


def _win_ms(win_start: str) -> int:
    dt = datetime.strptime(win_start, "%Y-%m-%d %H:%M:%S").replace(
        tzinfo=timezone.utc
    )
    return int(dt.timestamp() * 1000)


def _batch_hot_set(spark, sf_dir) -> set[tuple[int, int, int]]:
    return {
        (r.cell_x, r.cell_y, _win_ms(r.win_start))
        for r in batch_crowd_density(
            load_table(spark, "events", sf_dir)
        ).collect()
        if r.hot
    }


def test_alert_set_matches_batch_hot_set(spark, sf_dir):
    q = run_to_memory(
        streaming_hot_cell_alerts(stream_events(spark, sf_dir)),
        "hot_alerts",
    )
    try:
        alerts = spark.sql("SELECT * FROM hot_alerts").collect()
    finally:
        q.stop()
    got = {(r.cell_x, r.cell_y, r.win_start_ms) for r in alerts}
    # exactly once per (cell, window)
    assert len(got) == len(alerts)
    # every alert fired AT the crossing count, not after
    assert all(r.n_at_alert == STREAM_HOT_MIN for r in alerts)
    want = _batch_hot_set(spark, sf_dir)
    assert got == want
    assert want, "no hot cells at this scale would make the test vacuous"


def test_idle_cell_ttl_bounds_state(spark, sf_dir):
    """A tight TTL drops idle cells without losing in-window alerts
    for live ones: with TTL = one window, replay still produces the
    full alert set (eviction only ever happens behind the event-time
    frontier the replay keeps advancing)."""
    q = run_to_memory(
        streaming_hot_cell_alerts(
            stream_events(spark, sf_dir), ttl_ms=DAY_MS
        ),
        "hot_alerts_ttl",
    )
    try:
        alerts = spark.sql("SELECT * FROM hot_alerts_ttl").collect()
    finally:
        q.stop()
    got = {(r.cell_x, r.cell_y, r.win_start_ms) for r in alerts}
    assert got == _batch_hot_set(spark, sf_dir)
