"""The driver harness creates its own SparkSession with an arbitrary
timezone; oracle hash parity requires every timestamp-deriving query to
behave as UTC regardless. load_table pins spark.sql.session.timeZone at
runtime — this guards that seam."""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.registry import (
    QUERIES,
)


def _rows(spark, name, sf_dir):
    return sorted(
        tuple(r) for r in QUERIES[name](spark, sf_dir).collect()
    )


def test_timestamp_queries_ignore_session_timezone(spark, sf_dir):
    tz = spark.conf.get("spark.sql.session.timeZone")
    targets = [
        "crowded_frames",
        "asof_next_event",
        "sessionize",
        # r4 additions doing session-window / week-truncation arithmetic
        "session_window_stats",
        "retention_cohorts",
        "funnel_conversion",
        # week-truncated SCD2 intervals + epoch-second profiling
        "scd2_tier_join",
        "column_profile",
    ]
    try:
        utc = {n: _rows(spark, n, sf_dir) for n in targets}
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = {n: _rows(spark, n, sf_dir) for n in targets}
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    for n in targets:
        assert shifted[n] == utc[n], f"{n} drifted with session timezone"
