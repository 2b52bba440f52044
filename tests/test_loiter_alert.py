"""Streaming loiter alarm (streaming/loiter_alert.py): alarms over the
ts-ordered replay are exactly the batch episodes' threshold crossings,
once per episode."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.spatial import (
    LOITER_MIN_OBS,
    loiter_episodes,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.loiter_alert import (
    streaming_loiter_alerts,
    zone_of,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    run_to_memory,
    stream_events,
)

SF = "/root/testdata/sf0.01"  # the scale where dwell runs exist


def test_alarms_are_episode_threshold_crossings_once_each(spark):
    q = run_to_memory(
        streaming_loiter_alerts(stream_events(spark, SF)), "loiter_out"
    )
    try:
        got = sorted(
            (r.user_id, r.zone_x, r.zone_y, r.run_start_us, r.alarm_ts_us)
            for r in spark.table("loiter_out").collect()
        )
    finally:
        q.stop()
    # reference: walk the ordered events, find each >=MIN_OBS run's
    # start and its MIN_OBS-th observation time
    base = duckdb.sql(
        f"""SELECT user_id, event_id, epoch_us(ts)
            FROM read_parquet('{SF}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    want = []
    run: list = []
    prev_user = prev_zone = None
    for u, e, t_us in base:
        z = zone_of(e)
        if u != prev_user or z != prev_zone:
            run = []
        run.append((u, *z, int(t_us)))
        if len(run) == LOITER_MIN_OBS:
            want.append((u, *z, run[0][3], int(t_us)))
        prev_user, prev_zone = u, z
    assert got == sorted(want)
    assert got, "no alarms — parity is vacuous"
    # one alarm per batch episode with n_obs >= MIN (episodes can only
    # alarm once, however long the dwell continues)
    n_episodes = loiter_episodes(spark, SF).count()
    assert len(got) == n_episodes
