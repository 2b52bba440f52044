"""The global-window-unbounded detector (tools/explain_audit.py) and
the plan properties it guards, pinned as tests: the round-4 weak trio
(bigram_lift, key_skew_report, vocab_coverage) plus the two it caught
on arrival (shard_assignment, source_mixture_report) must keep their
partial-top-k / broadcast-total shapes, and the detector itself must
still recognize the bad shape it exists to catch — docstrings claimed
the bounded property while the plans lacked it, so the guard has to be
mechanical."""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.explain_audit import _global_window_unbounded  # noqa: E402

GUARDED = [
    ("text", "bigram_lift"),
    ("text", "vocab_coverage"),
    ("stats", "key_skew_report"),
    ("training_data", "shard_assignment"),
    ("training_data", "source_mixture_report"),
]


def _plan(df):
    return df._jdf.queryExecution().executedPlan()


def test_detector_flags_unbounded_global_window(spark, sf_dir):
    """The pre-fix shape: mixed rank + running-sum window over a full
    per-key aggregate (mixed window expressions block Spark's
    WindowGroupLimit rescue), rank-filtered only afterwards."""
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        per_key = events.groupBy("user_id").agg(F.count("*").alias("n"))
        w = Window.orderBy(F.col("n").desc())
        bad = per_key.select(
            "user_id",
            F.row_number().over(w).alias("rank"),
            F.sum("n").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("cum"),
        ).filter(F.col("rank") <= 10)
        assert _global_window_unbounded(_plan(bad))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)


def test_detector_accepts_partial_topk_shape(spark, sf_dir):
    """The fix pattern: orderBy().limit() (TakeOrderedAndProject) cuts
    the frame before the window, which then ranks <=k rows."""
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        per_key = events.groupBy("user_id").agg(F.count("*").alias("n"))
        w = Window.orderBy(F.col("n").desc())
        good = (
            per_key.orderBy(F.col("n").desc())
            .limit(10)
            .select(
                "user_id",
                F.row_number().over(w).alias("rank"),
                F.sum("n").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ).alias("cum"),
            )
        )
        assert not _global_window_unbounded(_plan(good))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)


def test_guarded_queries_stay_bounded(spark, sf_dir):
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans import (
        stats,
        text,
        training_data,
    )

    mods = {"text": text, "stats": stats, "training_data": training_data}
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for mod_name, qname in GUARDED:
            fn = getattr(mods[mod_name], qname)
            df = fn(spark, sf_dir)
            assert not _global_window_unbounded(_plan(df)), qname
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)
