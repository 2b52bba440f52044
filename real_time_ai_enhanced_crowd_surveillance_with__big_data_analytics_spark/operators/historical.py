"""Historical analytics layer: partitioned persistence (SURVEY.md §7.3
step 9 — the 100 TB posture the reference promises but never builds).

Detections/alerts persist as date/camera-partitioned parquet so the
trend queries prune partitions instead of scanning history. At 100 TB
the same layout maps onto an Iceberg/Delta table; the reader API and
pruning behavior are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    """Persist with hive-style partition directories. Partition columns
    must be low-cardinality prefixes of the common filters (day,
    camera) — that is what turns a trend query's WHERE into directory
    pruning instead of a full scan."""
    (df.write.mode("overwrite").partitionBy(*(partition_cols or ["day"])).parquet(path))


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def events_with_day(events: DataFrame) -> DataFrame:
    return events.withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
