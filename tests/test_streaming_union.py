"""Union of per-camera streams (SURVEY.md §2.7 in streaming form: the
reference runs one webcam loop; a fleet is N source streams unioned
into one pipeline — 'large number of cameras', paper p.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    run_to_memory,
)


def test_union_of_source_streams(spark, sf_dir, tmp_path):
    """Two disjoint event streams (odd/even users = two 'cameras')
    unioned under readStream must reproduce the batch union's per-type
    counts — same DataFrame code, two sources, one pipeline."""
    events = load_table(spark, "events", sf_dir)
    a_dir, b_dir = str(tmp_path / "cam_a"), str(tmp_path / "cam_b")
    events.filter(F.col("user_id") % 2 == 0).write.mode("overwrite").parquet(a_dir)
    events.filter(F.col("user_id") % 2 == 1).write.mode("overwrite").parquet(b_dir)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    cam_a = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(a_dir)
        .withColumn("camera", F.lit("a"))
    )
    cam_b = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(b_dir)
        .withColumn("camera", F.lit("b"))
    )
    # countDistinct is unsupported on streams; collect_set is the
    # bounded-cardinality equivalent (2 cameras)
    merged = cam_a.union(cam_b).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.size(F.collect_set("camera")).alias("n_cameras"),
    )
    q = run_to_memory(merged, "union_out", "complete")
    try:
        got = {
            r.event_type: (r.n, r.n_cameras)
            for r in spark.sql("SELECT * FROM union_out").collect()
        }
    finally:
        q.stop()
    want = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert all(v[1] == 2 for v in got.values())  # both streams contributed
