"""Streaming DSIR admission screen — ingest-time importance scoring
against a frozen corpus statistic, completing the data-selection
family's streaming story the way ``winnow_screen.py`` completes text
dedup's.

The batch pass (plans/data_selection.py::dsir_q_table) reduces the
whole corpus to its B-row quantized log-ratio table (h, q).  Unlike
pq_screen / winnow_screen — whose static sides are corpus-sized and
therefore meet the stream in a shuffled join — the DSIR statistic is
B-bounded BY DESIGN (B = 128 here; thousands at most in practice), so
the screen collects it once at stream construction and bakes it into
the plan as a literal map.  Scoring is then a pure per-row Column
fold: explode-free, join-free, no stream aggregation, no watermark, no
state — append mode with exactly-once restart for free, and the
per-document weight is the SAME exact int64 the batch ranking
computes (pinned by test_dsir_screen).

At 100 TB: arriving documents cost one Arrow-free codegen pass each;
refreshing the statistic is a batch job that rebuilds the q table and
restarts the stream (the statistic is a corpus property — updating it
in-flight would make admission depend on arrival order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..plans.data_selection import _token_bucket


def dsir_weight_col(text: Column, q_map: dict[int, int]) -> Column:
    """Exact int64 DSIR weight of one document as a Column expression:
    fold the token array through the literal (bucket -> micro-nat)
    map.  Buckets absent from the map (never seen in the corpus pass)
    score 0."""
    mapping = F.create_map(
        *[F.lit(v) for kv in sorted(q_map.items()) for v in kv]
    )
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.coalesce(mapping[_token_bucket(t)], F.lit(0).cast("long")),
    )


def streaming_dsir_screen(
    docs_stream: DataFrame, q_table: DataFrame, threshold_micro: int
) -> DataFrame:
    """(doc_id, weight_micro, admitted) per arriving document.

    ``q_table`` is the (h, q) DataFrame from ``dsir_q_table`` — read
    back from wherever the batch pass persisted it.  The collect here
    is scale-safe: the table is B rows by construction.
    """
    q_map = {int(r.h): int(r.q) for r in q_table.collect()}
    w = dsir_weight_col(F.col("text"), q_map)
    return docs_stream.select(
        "doc_id",
        w.alias("weight_micro"),
        (w >= F.lit(threshold_micro)).alias("admitted"),
    )
