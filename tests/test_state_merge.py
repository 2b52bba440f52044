"""state_merge_rollup: merge semantics pinned on a crafted events set
where a late partial collides with on-time state for the same
(day, event_type) group. Oracle parity at sf0.01 is the
driver/check_oracle gate; this pins the shard accounting and the
min/max/sum/count merge itself.
"""

from __future__ import annotations

import datetime as dt

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
    state_merge_rollup,
)


def _ev(eid, day, typ, value):
    return (
        eid,
        dt.datetime(2024, 1, day, 12, 0, 0),
        eid % 7,
        typ,
        value,
        "{}",
    )


# event_id % 20 == 19 marks the late slice.
ROWS = [
    # day 1 / click: two on-time + one LATE row -> 2 state shards;
    # the late row carries both the group min and max extension
    _ev(1, 1, "click", 10.00),
    _ev(2, 1, "click", 20.00),
    _ev(19, 1, "click", 0.50),
    # day 1 / view: on-time only -> 1 shard
    _ev(3, 1, "view", 5.25),
    # day 2 / click: late only -> 1 shard
    _ev(39, 2, "click", 7.77),
]


@pytest.fixture(scope="module")
def crafted_sf(spark, tmp_path_factory):
    sf = tmp_path_factory.mktemp("statemerge_sf")
    spark.createDataFrame(
        ROWS,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "events.parquet"))
    return str(sf)


def test_merge_matches_direct_aggregate(spark, crafted_sf):
    got = {
        (r["day"], r["event_type"]): r
        for r in state_merge_rollup(spark, crafted_sf).collect()
    }
    assert set(got) == {
        ("2024-01-01", "click"),
        ("2024-01-01", "view"),
        ("2024-01-02", "click"),
    }
    merged = got[("2024-01-01", "click")]
    assert merged["n_state_shards"] == 2  # late partial met on-time state
    assert merged["n_events"] == 3
    assert merged["sum_cents"] == 3050
    assert merged["min_value"] == 0.5  # contributed by the late shard
    assert merged["max_value"] == 20.0
    assert merged["avg_value"] == round(3050 / 300.0, 6)
    assert got[("2024-01-01", "view")]["n_state_shards"] == 1
    only_late = got[("2024-01-02", "click")]
    assert only_late["n_state_shards"] == 1
    assert only_late["n_events"] == 1
    assert only_late["sum_cents"] == 777


def test_shard_counts_on_testdata(spark, sf_dir):
    rows = state_merge_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_state_shards"] in (1, 2)
        assert r["min_value"] <= r["avg_value"] <= r["max_value"]
