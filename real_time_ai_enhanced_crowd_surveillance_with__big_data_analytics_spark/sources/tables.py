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

    ``events.ts`` arrives in one of three physical shapes depending on
    how the driver generated the parquet:

    - ``timestamp[us]`` (tz-naive) → Spark reads TIMESTAMP_NTZ; cast to
      session-local TIMESTAMP (session tz is pinned UTC below, so the
      NTZ→LTZ cast is value-preserving) so downstream
      ``ts.cast("long")`` epoch arithmetic keeps working.
    - ``TIMESTAMP(NANOS)`` → read as a nanos long via
      ``spark.sql.legacy.parquet.nanosAsLong`` and convert with integer
      division (floor, matching DuckDB's nanos→micros read).
    - tz-aware ``timestamp[us, UTC]`` → already TIMESTAMP, passthrough.

    The cast is a codegen'd projection; pushdown on other columns is
    unaffected.
    """
    base = sf_path or sf_dir()
    _ensure_session_conf(spark)
    df = spark.read.parquet(f"{base}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-local TIMESTAMP whatever the
    physical parquet shape (see ``load_table``); shared by the batch
    loader and the streaming source so batch ≡ stream parity holds by
    construction."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # legacy nanos-as-long read: FLOOR division to micros in pure
        # integer arithmetic (`div` truncates toward zero, wrong for
        # pre-epoch nanos; double `/` loses precision beyond 2^53 ns)
        return df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr("(ts - ((ts % 1000 + 1000) % 1000)) div 1000")
            ),
        )
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _ensure_session_conf(spark: SparkSession) -> None:
    """Session conf for oracle-compatible semantics.

    The two parity-critical confs are re-pinned on EVERY read, by
    contract (tests/test_timezone_pinning.py): UTC timestamps (DuckDB
    is UTC-naive) and nanos-as-long parquet reads (legacy testdata).
    Re-pinning is a local conf-map write — no job, no plan
    invalidation — and it makes reads immune to conf mutation between
    loads (several streaming tests legitimately flip nanosAsLong for
    synthesized sources).

    The shuffle-partition default is adjusted ONCE per session behind a
    marker: it is the only genuinely surprising mutation (round-1
    ADVICE item c), and a caller who later tunes it must not be
    overridden on the next read.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    marker = "spark.spark_graft.confApplied"
    try:
        if spark.conf.get(marker, "") == "true":
            return
    except Exception:
        pass
    # externally-created sessions default to 200 shuffle partitions —
    # wrong for both this machine and the test scale factors
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(max(os.cpu_count() or 4, 4))
        )
    spark.conf.set(marker, "true")


def load_tables(spark: SparkSession, sf_path: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_path) for name in TPCH_TABLES}


def register_views(spark: SparkSession, sf_path: str | None = None) -> None:
    """Register every driver table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_path).items():
        df.createOrReplaceTempView(name)
