"""Streaming drift monitor (streaming/drift.py): the maintained bin
table must equal the batch histogram after every drain, PSI read off
it must match the batch twin exactly, late data updates bins in
place, and a shifted distribution must raise the alert."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from conftest import write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.drift import (
    batch_psi_per_window,
    psi_per_window,
    reference_shares,
    streaming_bin_counts,
)

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture
def dirs(tmp_path):
    return (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )


def _typed(spark, src):
    from pyspark.sql import functions as F

    # conftest chunk schema has no event_type; derive one from user_id
    # so the monitor exercises multiple types
    return spark.read.parquet(src).withColumn(
        "event_type", F.concat(F.lit("t"), (F.col("user_id") % 2).cast("string"))
    )


def _drain(spark, src, out, ckpt):
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn(
            "event_type",
            F.concat(F.lit("t"), (F.col("user_id") % 2).cast("string")),
        )
    )
    q = streaming_bin_counts(raw, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_psi_stream_equals_batch_and_updates_late(spark, dirs):
    src, out, ckpt = dirs
    os.makedirs(src)
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731
    write_events_chunk(
        spark,
        src,
        "c1",
        [
            (1, 1, 10.0, t(0)),
            (2, 2, 30.0, t(5)),
            (1, 3, 50.0, t(40)),
            (2, 4, 55.0, t(70)),
            (1, 5, 490.0, t(80)),
        ],
    )
    ref = reference_shares(_typed(spark, src)).cache()
    _drain(spark, src, out, ckpt)

    def rel(df):
        return {
            (r.bucket_hour, r.event_type, r.psi, r.alert) for r in df.collect()
        }

    assert rel(psi_per_window(spark, out, ref)) == rel(
        batch_psi_per_window(_typed(spark, src), ref)
    )

    # late rows into an existing hour + a fresh hour: the changed bin
    # partitions rewrite in place, parity must hold again
    write_events_chunk(
        spark, src, "c2", [(1, 6, 12.0, t(40)), (2, 7, 200.0, t(130))]
    )
    _drain(spark, src, out, ckpt)
    assert rel(psi_per_window(spark, out, ref)) == rel(
        batch_psi_per_window(_typed(spark, src), ref)
    )


def test_shifted_distribution_alerts(spark, dirs):
    src, out, ckpt = dirs
    os.makedirs(src)
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731
    # reference: values concentrated in low bins
    write_events_chunk(
        spark,
        src,
        "base",
        [(1, i, float(5 + (i % 3) * 10), t(i)) for i in range(12)],
    )
    ref = reference_shares(_typed(spark, src)).cache()
    # stream adds a drifted hour: mass moved to the top bins — these
    # land in bin 24, which the reference never saw (the novel-bin
    # case: its mass must enter the sum, not silently drop)
    write_events_chunk(
        spark,
        src,
        "drift",
        [(1, 100 + i, 480.0, t(120 + i)) for i in range(8)],
    )
    # and a wholly novel event type (user 2 → t0) absent from the
    # reference: its windows must still appear, alerting
    write_events_chunk(
        spark, src, "newtype", [(2, 200 + i, 50.0, t(60 + i)) for i in range(4)]
    )
    _drain(spark, src, out, ckpt)
    rows = {
        (r.bucket_hour, r.event_type): r
        for r in psi_per_window(spark, out, ref).collect()
    }
    drifted = rows[("2024-01-01-02", "t1")]
    assert drifted.alert and drifted.psi > 0.2
    # novel-bin mass contributes ≈ (1-eps)·ln((1-eps)/eps) — far above
    # what the reference-bin terms alone would report
    assert drifted.psi > 5.0
    calm = rows[("2024-01-01-00", "t1")]
    assert not calm.alert
    novel = rows[("2024-01-01-01", "t0")]
    assert novel.alert and novel.psi > 5.0
