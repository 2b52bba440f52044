"""Unit tests for reusable operators on tiny hand-built frames
(SURVEY.md §5.2: known answers pinned from reference semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators import (
    rising_edges,
    topk_per_group,
)


def test_rising_edges_fires_once_per_episode(spark):
    # reference main.py:171-185: False→True→True→False→True ⇒ 2 alarms
    rows = [
        ("cam0", 1, False),
        ("cam0", 2, True),
        ("cam0", 3, True),
        ("cam0", 4, False),
        ("cam0", 5, True),
        ("cam1", 1, True),  # first-row True is an edge (initial state False)
    ]
    df = spark.createDataFrame(rows, "camera_id string, seq int, fire boolean")
    out = rising_edges(df, F.col("fire"), ["camera_id"], "seq", "alarm")
    got = {
        (r.camera_id, r.seq): (r.alarm_edge, r.alarm_episode)
        for r in out.collect()
    }
    assert got[("cam0", 1)] == (False, None)
    assert got[("cam0", 2)] == (True, 1)
    assert got[("cam0", 3)] == (False, 1)
    assert got[("cam0", 4)] == (False, None)
    assert got[("cam0", 5)] == (True, 2)
    assert got[("cam1", 1)] == (True, 1)


def test_topk_per_group_deterministic_tiebreak(spark):
    rows = [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 1.0), ("b", 4, 9.0)]
    df = spark.createDataFrame(rows, "k string, id int, v double")
    out = topk_per_group(df, ["k"], [F.desc("v"), F.asc("id")], k=2)
    got = sorted((r.k, r.id, r.rank) for r in out.collect())
    assert got == [("a", 1, 1), ("a", 2, 2), ("b", 4, 1)]
