"""CSV / JSON-lines sources with enforced schemas and dead-letter
capture — the interchange-format side of the source layer (parquet:
tables.py; Kafka: kafka.py).

The reference ingests nothing textual, but an engine replacing it needs
the standard drop-zone formats: detections exported as CSV, event
payloads as JSON lines (the same shape Kafka delivers,
sources/kafka.py). Conventions:

- **Schema is always explicit.** Inference (`inferSchema`/sampling)
  re-reads the data and guesses differently run-to-run — at 100 TB the
  extra pass alone disqualifies it.
- **PERMISSIVE + ``_corrupt_record``**: malformed rows land in a
  dead-letter column instead of killing the job (mirrors the Kafka
  decoder's ``corrupt`` flag); ``bad_rows``/``good_rows`` split them.
- CSV/JSON scans don't support predicate pushdown the way parquet
  does — column pruning still applies, and both formats split by line
  for parallel reads (except multiline JSON, which we never emit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType([*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with explicit schema; malformed rows survive in
    ``_corrupt_record`` instead of aborting (PERMISSIVE)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines with explicit schema; one object per line (splittable
    — multiline JSON is not), corrupt rows dead-lettered."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def good_rows(df: DataFrame) -> DataFrame:
    """Rows that parsed clean, corrupt column dropped."""
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def bad_rows(df: DataFrame) -> DataFrame:
    """Dead-letter rows: full row (typed columns null) + the raw text in
    ``_corrupt_record``. Deliberately NOT projected down to the corrupt
    column alone — Spark disallows scans whose only referenced column
    is the internal corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    keeping the row also preserves any columns that did parse."""
    return df.filter(F.col(CORRUPT_COL).isNotNull())
