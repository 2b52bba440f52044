"""Streaming alarm-episode operator: parity with a pure-Python
run-length reference under deliberately split micro-batches, plus
idle-key state eviction (SURVEY.md §2.9 / W2).
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest

from conftest import write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.stateful import (
    streaming_alarm_episodes,
)

T0 = dt.datetime(2024, 1, 1)
THRESH = 150.0


def _ms(t: dt.datetime) -> int:
    return int(t.timestamp() * 1000)


def _expected_closed(rows):
    """Run-length episodes in event_id order per user; the trailing run
    never closes (no falling edge), so it must NOT be emitted."""
    by_user = {}
    for uid, eid, value, ts in rows:
        by_user.setdefault(uid, []).append((eid, value, ts))
    out = set()
    for uid, evs in by_user.items():
        evs.sort()
        run = []
        for _eid, value, ts in evs:
            if value > THRESH:
                run.append((value, ts))
            elif run:
                out.add(
                    (
                        uid,
                        _ms(run[0][1]),
                        _ms(run[-1][1]),
                        len(run),
                        max(v for v, _ in run),
                    )
                )
                run = []
    return out


@pytest.fixture
def dirs(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "ckpt")


def test_streaming_episodes_match_python_reference(spark, dirs):
    src, ckpt = dirs
    os.makedirs(src)
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731
    # user 1: run of 3 closed by a low event, then an open trailing run
    # user 2: closed single-event run; user 3: never alarms
    rows = [
        (1, 1, 200.0, t(0)), (1, 2, 180.0, t(1)), (1, 3, 250.0, t(2)),
        (1, 4, 10.0, t(3)), (1, 5, 300.0, t(4)),
        (2, 6, 151.0, t(0)), (2, 7, 149.0, t(1)),
        (3, 8, 10.0, t(0)), (3, 9, 20.0, t(1)),
    ]
    # split mid-run across chunks: the run of user 1 straddles batches
    write_events_chunk(spark, src, "c1", rows[:2])
    write_events_chunk(spark, src, "c2", rows[2:6])
    write_events_chunk(spark, src, "c3", rows[6:])
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_alarm_episodes(stream, threshold=THRESH)
        .writeStream.format("memory")
        .queryName("episodes_parity")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.episode_start_ms, r.episode_end_ms,
             r.n_events, r.peak_value)
            for r in spark.sql("SELECT * FROM episodes_parity").collect()
        }
        # only keys with an OPEN run (or a previously materialized
        # cell) hold state: user 1's trailing run is open; user 2's run
        # straddled chunks c2/c3 (cell materialized while open); user 3
        # never alarmed and must NOT own a cell
        keys = {
            tuple(r.key)
            for r in spark.read.format("statestore")
            .option("path", ckpt).load().select("key").collect()
        }
        assert keys == {(1,), (2,)}
    finally:
        q.stop()
    assert got == _expected_closed(rows)


def test_streaming_episodes_idle_state_evicted(spark, dirs):
    src, ckpt = dirs
    os.makedirs(src)
    # an OPEN run (no falling edge) — the case that must hold a cell
    # until the idle TTL evicts it
    write_events_chunk(spark, src, "c1", [(1, 1, 200.0, T0)])
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_alarm_episodes(
            stream, threshold=THRESH,
            idle_ttl_ms=3_600_000, watermark="1 hour",
        )
        .writeStream.format("memory")
        .queryName("episodes_ttl")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        keys = (
            spark.read.format("statestore").option("path", ckpt).load()
            .select("key").collect()
        )
        assert len(keys) == 1  # user 1 holds a cell
        # far-future activity on another key advances the watermark past
        # user 1's TTL deadline
        write_events_chunk(
            spark, src, "c2", [(2, 3, 10.0, T0 + dt.timedelta(days=60))]
        )
        q.processAllAvailable()
        time.sleep(1)
        q.processAllAvailable()  # no-data batch fires the timeout
        keys = {
            tuple(r.key)
            for r in spark.read.format("statestore")
            .option("path", ckpt).load().select("key").collect()
        }
        assert (1,) not in keys  # idle camera evicted
    finally:
        q.stop()
