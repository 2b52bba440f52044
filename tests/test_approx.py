"""Approximate-aggregate accuracy vs exact twins, and range-join
equivalence vs the naive theta join."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.range_join import (
    range_join,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.relational import (
    approx_aggregates,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def test_approx_within_tolerance_of_exact(spark, sf_dir):
    """The query's own in_bounds flags must all hold, and its exact
    columns must equal an independently computed exact aggregate —
    tighter than the oracle's corridor (which only pins the flags)."""
    approx = {r.event_type: r for r in approx_aggregates(spark, sf_dir).collect()}
    events = load_table(spark, "events", sf_dir)
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, e in exact.items():
        a = approx[et]
        assert a.n_users == e.users
        assert abs(a.p50 - e.p50) <= 1e-6
        assert a.hll_in_bounds and a.p50_in_bounds and a.p95_in_bounds


def test_range_join_equals_naive_theta_join(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("p_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("cid"),
        F.col("ts").alias("c_ts"),
    )
    window_s = 1800
    naive = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (
            F.abs(F.col("p_ts").cast("long") - F.col("c_ts").cast("long"))
            <= window_s
        ),
    ).select("pid", "cid")
    clicks2 = clicks.withColumnRenamed("c_user", "user_id")
    bucketed = range_join(
        purchases, clicks2, "user_id", "p_ts", "c_ts", window_s
    ).select("pid", "cid")
    assert sorted(map(tuple, naive.collect())) == sorted(
        map(tuple, bucketed.collect())
    )


def test_stratified_sample_deterministic_and_bounded(spark, sf_dir):
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.relational import (
        SAMPLE_FRACTIONS,
        stratified_sample,
    )

    r1 = {r.event_type: r.n_sampled for r in stratified_sample(spark, sf_dir).collect()}
    r2 = {r.event_type: r.n_sampled for r in stratified_sample(spark, sf_dir).collect()}
    assert r1 == r2  # seeded determinism
    events = load_table(spark, "events", sf_dir)
    totals = {r.event_type: r.n for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for et, frac in SAMPLE_FRACTIONS.items():
        if frac == 1.0:
            assert r1[et] == totals[et]
        else:  # Bernoulli sampling: loose 5-sigma bound
            import math

            exp = totals[et] * frac
            sd = math.sqrt(totals[et] * frac * (1 - frac))
            assert abs(r1[et] - exp) <= 5 * sd + 1
