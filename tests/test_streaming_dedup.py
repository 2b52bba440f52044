"""Streaming deduplication (SURVEY.md §2.9 late-data row: reference
semantics are 'latest wins, no replay'; Spark adds replay + exactly-once
dedup via dropDuplicates on the frame key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    run_to_memory,
    stream_events,
)


def test_streaming_drop_duplicates(spark, sf_dir, tmp_path):
    """Replay the events table TWICE (duplicated files) through a
    stream with dropDuplicates(event_id): every event must come out
    exactly once."""
    events = load_table(spark, "events", sf_dir)
    dup_dir = str(tmp_path / "dup_events")
    events.write.mode("overwrite").parquet(dup_dir)
    events.write.mode("append").parquet(dup_dir)  # duplicates

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dup_dir)
        .dropDuplicates(["event_id"])
    )
    q = run_to_memory(
        stream.groupBy().agg(F.count("*").alias("n")), "dedup_out", "complete"
    )
    try:
        n = spark.sql("SELECT n FROM dedup_out").collect()[0].n
    finally:
        q.stop()
    assert n == events.count()


def test_streaming_drop_duplicates_within_watermark(spark, sf_dir, tmp_path):
    """State-BOUNDED streaming dedup — the 100 TB form. Plain
    dropDuplicates keeps every key in state forever (state grows with
    the stream); dropDuplicatesWithinWatermark expires per-key state
    once event time passes the watermark, so state size tracks the
    watermark window, not stream history. Same exactly-once output on
    a duplicated replay whose duplicates land within the watermark."""
    events = load_table(spark, "events", sf_dir)
    dup_dir = str(tmp_path / "dup_events_wm")
    events.write.mode("overwrite").parquet(dup_dir)
    events.write.mode("append").parquet(dup_dir)  # duplicates

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dup_dir)
        .withWatermark("ts", "365 days")  # covers the table's full span
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = run_to_memory(
        stream.groupBy().agg(F.count("*").alias("n")), "dedup_wm_out", "complete"
    )
    try:
        n = spark.sql("SELECT n FROM dedup_wm_out").collect()[0].n
    finally:
        q.stop()
    assert n == events.count()
