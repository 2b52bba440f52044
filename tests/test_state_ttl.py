"""State-store TTL eviction for the stateful streaming operators
(SURVEY.md §2.9): completed frames leave the NMS state store once the
watermark passes their horizon, and idle cameras leave the rising-edge
store after the processing-time TTL. Both are read back through the
Spark 4 state data source against the query's own checkpoint.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest

from conftest import write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.pipeline import (
    streaming_crowd_alerts,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.stateful import (
    streaming_rising_edges,
)

T0 = dt.datetime(2024, 1, 1)


def _state_keys(spark, ckpt: str) -> list[tuple]:
    rows = (
        spark.read.format("statestore")
        .option("path", ckpt)
        .load()
        .select("key")
        .collect()
    )
    return [tuple(r.key) for r in rows]


@pytest.fixture
def dirs(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "ckpt")


def test_crowd_state_evicted_after_watermark(spark, dirs):
    src, ckpt = dirs
    os.makedirs(src)
    # frame batch at T0; event_ids 1..8 give 5 confidence-passing
    # detections across 5 distinct frames (event_id % 50)
    write_events_chunk(spark, src, "f1", [(1, e, 0.0, T0) for e in range(1, 9)])
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got: dict = {}

    def sink(df, _bid):
        for r in df.collect():
            got[(r.camera_id, r.frame_id)] = r.n_persons

    q = streaming_crowd_alerts(
        stream,
        sink,
        watermark="1 hour",
        frame_ttl_ms=3_600_000,
        checkpoint_dir=ckpt,
    )
    try:
        q.processAllAvailable()
        before = _state_keys(spark, ckpt)
        assert len(before) == len(got) > 0  # one state cell per live frame

        # a far-future event (999 passes the confidence filter) drags
        # the watermark past every T0 frame's ts + TTL
        write_events_chunk(
            spark, src, "f2", [(2, 999, 0.0, T0 + dt.timedelta(days=60))]
        )
        q.processAllAvailable()
        time.sleep(1)
        q.processAllAvailable()  # no-data batch processes the timeouts

        after = _state_keys(spark, ckpt)
        assert after == [(2, 999 % 50)]  # every T0 frame evicted
        # eviction emits nothing: the frames' last verdicts stand
        assert all(k in got for k in before)
    finally:
        q.stop()


def test_rising_edges_state_evicted_when_idle(spark, dirs):
    src, ckpt = dirs
    os.makedirs(src)
    write_events_chunk(
        spark, src, "f1", [(1, 1, 200.0, T0), (1, 2, 100.0, T0)]
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_rising_edges(
            stream, threshold=150.0, idle_ttl_ms=3_600_000, watermark="1 hour"
        )
        .writeStream.format("memory")
        .queryName("ttl_edges")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        assert _state_keys(spark, ckpt) == [(1,)]

        # camera 2 sixty days later: the watermark leaves camera 1's
        # newest event + TTL far behind → camera 1 is idle, evict
        write_events_chunk(
            spark, src, "f2", [(2, 3, 300.0, T0 + dt.timedelta(days=60))]
        )
        q.processAllAvailable()
        time.sleep(1)
        q.processAllAvailable()  # no-data batch processes the timeouts

        after = _state_keys(spark, ckpt)
        assert (1,) not in after  # idle camera evicted
        assert (2,) in after  # active camera re-armed
        # the active camera's edge still fired
        rows = spark.sql(
            "select * from ttl_edges where user_id = 2"
        ).collect()
        assert [(r.event_id, r.episode) for r in rows] == [(3, 1)]
    finally:
        q.stop()


def test_late_arrival_does_not_move_deadline_backward(spark, dirs):
    """Regression (r4 self-review): the eviction deadline derives from
    the key's newest-EVER event, persisted in state — a late
    in-watermark arrival for the frame must not pull the deadline
    earlier and cause premature eviction."""
    src, ckpt = dirs
    os.makedirs(src)
    H = dt.timedelta(hours=1)
    # events 4 and 54 share frame key 4 (both pass the confidence gate)
    write_events_chunk(spark, src, "f1", [(1, 4, 0.0, T0 + 10 * H)])
    got: dict = {}

    def sink(df, _bid):
        for r in df.collect():
            got[(r.camera_id, r.frame_id)] = r.n_persons

    q = streaming_crowd_alerts(
        stream := (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        ),
        sink,
        watermark="1 hour",
        frame_ttl_ms=3_600_000,
        checkpoint_dir=ckpt,
    )
    try:
        q.processAllAvailable()
        # late (but in-watermark) second box for the SAME frame: older
        # ts than the stored max — deadline must stay T0+10h + TTL
        write_events_chunk(
            spark, src, "f2", [(1, 54, 0.0, T0 + 9 * H + dt.timedelta(minutes=30))]
        )
        q.processAllAvailable()
        assert got[(1, 4)] == 2  # both boxes merged into the frame
        # watermark to T0+10h45m: past the REGRESSED deadline
        # (9h30m + 1h) but before the correct one (10h + 1h)
        write_events_chunk(
            spark, src, "f3", [(2, 5, 0.0, T0 + 11 * H + dt.timedelta(minutes=45))]
        )
        q.processAllAvailable()
        time.sleep(1)
        q.processAllAvailable()
        assert (1, 4) in _state_keys(spark, ckpt)  # NOT evicted early
        # and the frame finally evicts once the true deadline passes
        write_events_chunk(
            spark, src, "f4", [(2, 6, 0.0, T0 + 13 * H)]
        )
        q.processAllAvailable()
        time.sleep(1)
        q.processAllAvailable()
        assert (1, 4) not in _state_keys(spark, ckpt)
    finally:
        q.stop()
