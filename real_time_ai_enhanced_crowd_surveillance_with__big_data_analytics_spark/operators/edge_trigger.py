"""Rising-edge alarm detection (SURVEY.md W2).

Reference semantics: module-global booleans flip when a condition starts
holding and the alarm fires exactly once per episode
(``Fire_Reported``/``Alarm_Status`` — reference main.py:12-23,171-185;
duplicate trigger block main.py:264-266). The two inconsistent trigger
blocks are reconciled into one rule: an alarm fires on the False→True
transition of the condition, once per episode.

Batch form: ``lag`` over an ordered per-key window — a single shuffle on
the key, then whole-stage-codegen comparisons. The streaming form lives
in ``streaming/stateful.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rising_edges(
    df: DataFrame,
    condition: Column,
    key_cols: list[str],
    order_col: str,
    flag_name: str = "fired",
) -> DataFrame:
    """Mark rows where ``condition`` transitions False→True per key.

    The first row of a key with condition=True is an edge (reference
    initial state is False, main.py:12-14). Adds:
      - ``<flag>``: the condition value
      - ``<flag>_edge``: True exactly on rising edges
      - ``<flag>_episode``: 1-based episode counter (running count of
        edges), NULL while the condition is False.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    prev = F.lag(condition, 1, False).over(w)
    edge = condition & ~prev
    episode = F.sum(edge.cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(flag_name, condition)
        .withColumn(f"{flag_name}_edge", edge)
        .withColumn(
            f"{flag_name}_episode",
            F.when(condition, episode).otherwise(F.lit(None).cast("long")),
        )
    )
