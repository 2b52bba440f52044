"""Streaming materialized rollup: the on-disk table equals the batch
aggregate after every drain, survives restart, and replaying a batch
is idempotent (exactly-once without a transactional format).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from conftest import write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.rollup import (
    streaming_hourly_rollup,
)

T0 = dt.datetime(2024, 1, 1)


def _batch_expect(spark, src):
    from pyspark.sql import functions as F

    return {
        (r.bucket_hour, r.event_type, r.n_events, round(r.sum_value, 4))
        for r in (
            spark.read.parquet(src)
            .groupBy(
                F.date_format(
                    F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH"
                ).alias("bucket_hour"),
                F.lit("event").alias("event_type"),
            )
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
            .collect()
        )
    }


def _table(spark, out):
    return {
        (r.bucket_hour, r.event_type, r.n_events, round(r.sum_value, 4))
        for r in spark.read.parquet(out).collect()
    }


@pytest.fixture
def dirs(tmp_path):
    return (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )


def test_rollup_table_matches_batch_and_survives_restart(spark, dirs):
    src, out, ckpt = dirs
    os.makedirs(src)
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731
    # conftest chunk schema is (user_id, event_id, value, ts); the
    # rollup groups by hour only, so a fixed type column suffices
    write_events_chunk(
        spark, src, "c1",
        [(1, 1, 10.0, t(0)), (1, 2, 5.0, t(30)), (2, 3, 7.0, t(90))],
    )

    def stream():
        from pyspark.sql import functions as F

        raw = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumn("event_type", F.lit("event"))
        )
        return streaming_hourly_rollup(raw, out, ckpt)

    q = stream()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _table(spark, out) == _batch_expect(spark, src)

    # restart with late-arriving data for an EXISTING hour plus a new
    # hour: the changed partitions rewrite, the rest stand
    write_events_chunk(
        spark, src, "c2", [(3, 4, 2.0, t(40)), (3, 5, 9.0, t(150))]
    )
    q = stream()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _table(spark, out) == _batch_expect(spark, src)
    # hour 0 was updated in place: one row, merged totals
    rows = [r for r in _table(spark, out) if r[0].endswith("-00")]
    assert rows == [("2024-01-01-00", "event", 3, 17.0)]
