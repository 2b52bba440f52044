"""SparkSession factory tuned for the driver harness.

Local mode here is `local[N]` (single JVM); the conf below is chosen so
the same code scales to a multi-executor cluster: AQE on (runtime
coalesce + skew-join handling), Arrow on (pandas-UDF hot paths), UTC
session timezone (DuckDB-oracle timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "crowd_analytics", cpus: int | None = None) -> SparkSession:
    """Create (or fetch) a SparkSession with scale-aware defaults.

    ``SPARK_GRAFT_CPUS`` overrides parallelism (driver bench contract).
    On a real cluster the master/memory settings come from spark-submit;
    everything set here is cluster-safe.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Driver testdata stores events.ts as TIMESTAMP(NANOS); Spark has
        # no nanos timestamp — read as long, loader converts to micros
        # (same floor-to-micros DuckDB applies).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ANSI off: reference semantics are permissive Python/NumPy, and
        # the DuckDB oracle comparison rounds in the query layer.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
    )
    if "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_CONNECT_MODE_ENABLED"):
        builder = builder.master(f"local[{cpus}]").config("spark.driver.memory", "90g")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
