"""State-store TTL eviction for the stateful streaming operators
(SURVEY.md §2.9): completed frames leave the NMS state store once the
watermark passes their horizon, and idle cameras leave the rising-edge
store after the processing-time TTL. Both are read back through the
Spark 4 state data source against the query's own checkpoint.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

import pytest
from pyspark.sql import types as T

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.pipeline import (
    streaming_crowd_alerts,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.stateful import (
    streaming_rising_edges,
)

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

T0 = dt.datetime(2024, 1, 1)


def _write_chunk(spark, src: str, name: str, rows) -> None:
    """One replay chunk = one parquet file = one micro-batch."""
    tmp = f"{src}/_{name}"
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet")
    shutil.rmtree(tmp)


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
    _write_chunk(spark, src, "f1", [(1, e, 0.0, T0) for e in range(1, 9)])
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
        _write_chunk(
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
    _write_chunk(
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
        _write_chunk(
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
