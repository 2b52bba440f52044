"""ORC source/sink seam — the second columnar interchange format next
to parquet (sources/tables.py).

The reference persists nothing columnar (its only storage is Django's
SQLite, settings.py:78-83); an engine replacing it meets ORC wherever
Hive-era lakes hand data over. Same conventions as the parquet layer:

- **Schema is always explicit on read** — no footer-sampling surprises
  when files were written by other engines with looser types.
- ORC scans get the same Catalyst treatment as parquet: column
  pruning, predicate pushdown into the stripe/row-group indexes, and
  partition pruning on directory layout — so the 100 TB posture
  (filters reach the scan) carries over unchanged.
- Compression pinned to zstd (splittable, best scan-speed/size
  trade-off of the supported codecs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """zstd ORC; optional hive-style partition directories (the same
    date/camera layout operators/historical.py uses for parquet)."""
    w = df.write.mode("overwrite").option("compression", "zstd")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC scan with enforced schema (pruning + pushdown still apply)."""
    return spark.read.schema(schema).orc(path)
