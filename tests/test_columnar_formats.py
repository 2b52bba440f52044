"""ORC seam round-trip: value parity with the parquet loader and
pushdown/pruning surviving the format swap (sources/columnar.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.columnar import (
    read_orc,
    write_orc,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def test_orc_round_trip_matches_parquet(spark, sf_dir, tmp_path):
    events = load_table(spark, "events", sf_dir).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    path = str(tmp_path / "events_orc")
    write_orc(events, path)
    back = read_orc(spark, path, events.schema)
    assert back.schema == events.schema
    a = {tuple(r) for r in events.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_orc_scan_prunes_and_pushes_down(spark, sf_dir, tmp_path):
    events = load_table(spark, "events", sf_dir).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    path = str(tmp_path / "events_orc_pd")
    write_orc(events, path)
    q = (
        read_orc(spark, path, events.schema)
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # predicate reaches the ORC scan, projection prunes to 3 columns
    assert "PushedFilters: [" in plan and "event_type" in plan
    assert "value" not in plan.split("ReadSchema")[1][:200]


def test_orc_partitioned_layout_prunes_partitions(spark, sf_dir, tmp_path):
    events = load_table(spark, "events", sf_dir).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    path = str(tmp_path / "events_orc_part")
    write_orc(events, path, partition_by=["event_type"])
    schema = events.drop("event_type").schema
    q = read_orc(spark, path, schema).filter(F.col("event_type") == "click")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_type" in plan
    n_click = events.filter(F.col("event_type") == "click").count()
    assert q.count() == n_click
