"""Top-k per group (SURVEY.md W1; reference torch.topk, main.py:80-81).

Window form: one shuffle on the group key; rank + filter stays inside
whole-stage codegen. At 100 TB a per-key top-k via window beats a global
sort because only the group shuffle is needed and AQE coalesces the
post-filter partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Keep the top-k rows per key by ``order_by`` (descending handled by
    caller passing ``F.desc(...)`` columns). Uses ``row_number`` for the
    reference's deterministic 'stable sort, take k' semantics
    (main.py:80: topk over scores)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )
