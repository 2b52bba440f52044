"""Parquet sources for the driver testdata (TESTDATA.md).

Plain ``spark.read.parquet`` so Catalyst gets pushdown/pruning for free
(reference equivalents: webcam scan main.py:143, coco.names scan
main.py:47-48, SQLite scan settings.py:78-83 — see SURVEY.md §2.1).

At 100 TB these tables would be date/camera-partitioned parquet (or
Iceberg); the reader API is identical, partition pruning comes from the
filter expressions already in the queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TPCH_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, name: str, sf_path: str | None = None) -> DataFrame:
    """Read one driver table; column pruning + predicate pushdown apply.

    ``events.ts`` is parquet TIMESTAMP(NANOS) — Spark reads it as a
    nanos long (``spark.sql.legacy.parquet.nanosAsLong``); convert to a
    micros timestamp here (floor, matching DuckDB's nanos→micros read).
    The cast is a codegen'd projection; pushdown on other columns is
    unaffected.
    """
    base = sf_path or sf_dir()
    # All settable at runtime; applied here so externally-created
    # sessions (the driver harness) get oracle-compatible semantics:
    # UTC timestamps (DuckDB is UTC-naive) and nanos-as-long reads.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # externally-created sessions default to 200 shuffle partitions —
    # wrong for both this machine and the test scale factors
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(max(os.cpu_count() or 4, 4))
        )
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{base}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def load_tables(spark: SparkSession, sf_path: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_path) for name in TPCH_TABLES}


def register_views(spark: SparkSession, sf_path: str | None = None) -> None:
    """Register every driver table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_path).items():
        df.createOrReplaceTempView(name)
