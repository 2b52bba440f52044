"""Streaming ordered-funnel monitor — the live twin of
``plans/relational.py::funnel_conversion``: per user, the
view → click → purchase stage machine advanced as events arrive,
emitting one row per stage ADVANCE (the real-time funnel dashboard;
the batch query recomputes the same report retrospectively).

Semantics: a stage converts only with an event strictly AFTER the
previous stage's converting event — the batch query's rule. Over
ts-ordered arrival (the replay, or any in-order source) the greedy
machine computes exactly the batch chain (first view; first click
after it; first purchase after that), so stream counts ≡ batch counts
— pinned by the parity test. Under OUT-OF-ORDER arrival the machine
is deliberately arrival-greedy: it never regresses a stage and never
re-opens a decided one (the standard streaming-funnel contract —
deciding "was there an earlier qualifying click" exactly would mean
buffering every event per user forever). The out-of-order test pins
that divergence explicitly instead of leaving it folklore.

State per user: the stage ordinal and the converting timestamp — two
ints — so state is bounded by |users|, never by stream length.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STAGES = ("view", "click", "purchase")

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("stage_ord", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("ts_us", T.LongType(), False),
    ]
)

_FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.IntegerType(), True),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)


def _machine_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    uid = int(key[0])
    if state.exists:
        stage, last = (int(v) for v in state.get)
    else:
        stage, last = 0, -1
    rows = []
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])  # in-batch event order
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        types = pdf["event_type"].to_numpy()
        for t_us, et in zip(ts_us, types):
            if stage < len(STAGES) and et == STAGES[stage] and t_us > last:
                stage += 1
                last = int(t_us)
                rows.append((uid, stage, STAGES[stage - 1], last))
    state.update((stage, last))
    yield pd.DataFrame(
        rows, columns=[f.name for f in FUNNEL_OUTPUT_SCHEMA.fields]
    )


def streaming_funnel_monitor(events: DataFrame) -> DataFrame:
    """Append-mode stage-advance rows, one per (user, stage) — a user
    emits at most three rows over the whole stream."""
    keyed = events.select("user_id", "event_id", "event_type", "ts")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _machine_fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
