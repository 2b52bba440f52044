"""Stream-stream interval join (SURVEY.md §2.9 extension): the same
click↔purchase pairing runs as a batch join and as a watermarked
stream-stream join over the replayed events table, and must produce
identical pairs (Structured Streaming's batch/stream unification)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    click_purchase_pairs,
    run_to_memory,
    stream_events,
)

WINDOW_S = 1800


def _split(events):
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return purchases, clicks


def test_stream_stream_join_matches_batch(spark, sf_dir):
    batch_events = load_table(spark, "events", sf_dir)
    bp, bc = _split(batch_events)
    expected = sorted(
        (r.user_id, r.purchase_id, r.click_id)
        for r in click_purchase_pairs(bp, bc, WINDOW_S).collect()
    )
    assert expected, "fixture must produce at least one pair"

    sp, sc = _split(stream_events(spark, sf_dir))
    q = run_to_memory(
        click_purchase_pairs(sp, sc, WINDOW_S), "ss_join_pairs"
    )
    try:
        got = sorted(
            (r.user_id, r.purchase_id, r.click_id)
            for r in spark.table("ss_join_pairs").collect()
        )
    finally:
        q.stop()
    assert got == expected
