"""Streaming frame-feed Python DataSource (SURVEY.md S1): offset
advance, exact drain at the cap, deterministic replay, and
checkpoint-restart resumption without loss or duplication.
"""

from __future__ import annotations

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.framefeed import (
    frame_row,
    register_framefeed_source,
)


@pytest.fixture(scope="module")
def registered(spark):
    register_framefeed_source(spark)
    return spark


def _stream(spark, **opts):
    r = spark.readStream.format("framefeed")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_drains_exactly_max_frames(registered, tmp_path):
    q = (
        _stream(registered, maxFrames=100, framesPerBatch=32, cameras=4)
        .writeStream.format("memory")
        .queryName("feed_drain")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = registered.sql("SELECT * FROM feed_drain").collect()
    finally:
        q.stop()
    assert sorted(r.frame_id for r in rows) == list(range(100))
    expect = {frame_row(i, 4, 1704067200.0, 30.0) for i in range(100)}
    assert {(r.camera_id, r.frame_id, r.ts, r.score) for r in rows} == expect


def test_checkpoint_restart_resumes_without_loss_or_dup(registered, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    got = []

    def sink(df, _bid):
        got.extend(r.frame_id for r in df.collect())

    def start(cap):
        return (
            _stream(registered, maxFrames=cap, framesPerBatch=10)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start(cap=30)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(got) == list(range(30))
    # restart with a higher cap: a FRESH reader (offset counter at 0)
    # must resume from the committed offset 30, not re-emit frames
    q = start(cap=50)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(got) == list(range(50)), "restart lost or re-emitted frames"


def test_feeds_streaming_operators(registered, tmp_path):
    """The feed composes with the engine's own stateful operators."""
    from pyspark.sql import functions as F

    counts = (
        _stream(registered, maxFrames=120, framesPerBatch=40, cameras=6)
        .groupBy("camera_id")
        .agg(F.count("*").alias("n"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("feed_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = registered.sql("SELECT * FROM feed_counts").collect()
    finally:
        q.stop()
    assert {r.camera_id: r.n for r in rows} == {c: 20 for c in range(6)}
