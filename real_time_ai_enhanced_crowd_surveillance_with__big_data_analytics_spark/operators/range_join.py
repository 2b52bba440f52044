"""Bucketized range join (SURVEY guide 'As-of / range join' pattern —
Spark has no native interval join; a naive theta join is a cartesian
product).

Pattern: bucket the range key into fixed-width buckets, equi-join on
(key, bucket) with the probe side exploded to adjacent buckets, then
apply the exact range predicate. The equi-join hash-partitions — the
cartesian never materializes — and the bucket width bounds candidate
inflation to ±1 bucket per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``left`` to rows of ``right`` with the same ``key``
    and |left_ts − right_ts| ≤ window_seconds. Timestamps compare at
    whole-second resolution (floor), matching the DuckDB oracle's
    epoch arithmetic."""
    bucket = lambda c: F.floor(F.col(c).cast("long") / window_seconds)  # noqa: E731
    b = bucket(left_ts)
    lhs = left.withColumn(
        "_rb", F.explode(F.array(b - 1, b, b + 1))
    )
    rhs = right.withColumn("_rb", bucket(right_ts))
    exact: Column = (
        F.abs(F.col(left_ts).cast("long") - F.col(right_ts).cast("long"))
        <= window_seconds
    )
    return lhs.join(rhs, [key, "_rb"], how).filter(exact).drop("_rb")
