"""Streaming materialized rollup: maintain a queryable on-disk hourly
aggregate table from the event stream, exactly-once across restarts
(SURVEY.md §2.9 delivery + the 'historical trend' table the reference
promises but recomputes from scratch).

Pattern: update-mode windowed aggregate → ``foreachBatch`` →
DYNAMIC partition overwrite keyed by (hour, type). Update mode emits
only the (hour, type) keys a micro-batch changed; each such key owns
its own partition directory, so rewriting exactly those partitions is
idempotent — a replayed batch rewrites the same partitions with the
same totals, which is what makes checkpoint-restart exactly-once
WITHOUT a transactional table format. (Partitioning by hour alone
would be wrong: a batch that touches one type of an hour would wipe
the hour's other types.)

At 100 TB the partition count is calendar-bounded (hours × types), the
classic serving-table layout; readers prune by hour.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def partition_upsert_writer(
    out_dir: str, partition_cols: Sequence[str]
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer implementing the idempotent-upsert recipe:
    dynamic partition overwrite of exactly the partitions a micro-batch
    emitted. Correct ONLY when the streaming aggregate's key equals
    ``partition_cols`` — then a replayed batch rewrites the same
    partitions with the same totals (exactly-once without a
    transactional format). Shared by the hourly rollup and the drift
    monitor's bin table."""

    def upsert(batch: DataFrame, _bid: int) -> None:
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch.write.mode("overwrite")
                .partitionBy(*partition_cols)
                .parquet(out_dir)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return upsert


def streaming_hourly_rollup(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "35 days",
) -> StreamingQuery:
    """Start the maintenance query; the rollup table at ``out_dir`` is
    partitioned parquet (bucket_hour=…/event_type=…) readable at any
    time with ``spark.read.parquet``."""
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH").alias(
                "bucket_hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )

    upsert = partition_upsert_writer(out_dir, ("bucket_hour", "event_type"))
    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
