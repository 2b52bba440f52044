"""Non-UTC-session parity net (the verify skill's recurring trap): a
harness session configured with a non-UTC timezone must still produce
oracle-identical results for timestamp-deriving queries, because
sources/tables.py::load_table re-pins UTC at runtime. If that pinning
ever regresses, these hash comparisons go red here instead of in a
judge round."""

from __future__ import annotations

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans import (
    ORACLES,
    QUERIES,
)

SF = "/root/testdata/sf0.001"

# timestamp-deriving shapes across the families added this round:
# dense-hour spines, day diffs, hour-of-day buckets, epoch seconds
_PROBES = (
    "ewma_forecast",
    "cusum_changepoints",
    "theil_sen_trend",
    "rfm_segments",
    "hour_value_gamma",
    "cohort_ltv_triangle",
    "interarrival_burstiness",
    # the sharded twin's shard_day = to_date(ts) is the one seam the
    # anchor doesn't have — a drifted session tz would cut shards at
    # the wrong midnight (stitching still reproduces the gap multiset,
    # but the UTC pin is the invariant this net exists to hold)
    "interarrival_burstiness_sharded",
    "loiter_episodes",
    # r9: interval arithmetic + a fixed-literal timestamp predicate +
    # date_format output — three tz seams in one query
    "session_expiry_scan",
)


@pytest.mark.parametrize("name", _PROBES)
def test_query_is_session_timezone_proof(spark, name):
    con = duckdb.connect()
    for t in ("events",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = sorted(
        tuple(str(v) for v in row) for row in con.sql(ORACLES[name]).fetchall()
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = sorted(
            tuple(str(v) for v in row)
            for row in QUERIES[name](spark, SF).collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == want, f"{name} drifted under a non-UTC session"
