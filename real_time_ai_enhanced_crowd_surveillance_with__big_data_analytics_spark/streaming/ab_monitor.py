"""Streaming experiment monitor — the live counterpart of
``plans/ml_eval.py::ab_test_report``: per event type, the two-arm
Welch-style 2σ decision re-evaluated as data streams in, emitting a
row ONLY when the verdict changes (the sequential-testing dashboard
every experimentation platform runs between scheduled readouts).

The decision rule is the SAME cleared-denominator integer comparison
as the batch report (imported, not re-derived), evaluated on exact
per-arm sufficient statistics ``(n, Σcents, Σcents²)`` — six ints per
key, the entire state. Python's arbitrary-precision ints make the
cleared products exact here just as DECIMAL(38,0)/HUGEINT do in the
engines.

Emission contract: one row per verdict TRANSITION (including the first
evaluation once both arms reach ``MIN_N``), stamped with the per-key
cumulative row count at the flip — so a replay of the same chunk
sequence reproduces the identical flip history (pinned by the
checkpoint-restart test). No watermark: the monitor is a pure
accumulation over arrival order; batch-boundary timing affects WHEN a
flip is observed, never WHETHER the final verdict matches the batch
rule on the same data (pinned by the parity test).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.ml_eval import AB_SIGMA

MIN_N = 30  # per-arm observations before the first verdict

AB_MONITOR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("rows_seen", T.LongType(), False),
        T.StructField("n_c", T.LongType(), False),
        T.StructField("n_t", T.LongType(), False),
        T.StructField("effect_e6", T.LongType(), False),
        T.StructField("significant", T.BooleanType(), False),
    ]
)

_AB_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_c", T.LongType(), True),
        T.StructField("s_c", T.LongType(), True),
        T.StructField("q_c", T.LongType(), True),
        T.StructField("n_t", T.LongType(), True),
        T.StructField("s_t", T.LongType(), True),
        T.StructField("q_t", T.LongType(), True),
        T.StructField("last_verdict", T.IntegerType(), True),  # -1 none
    ]
)


def decide(n_c: int, s_c: int, q_c: int, n_t: int, s_t: int, q_t: int) -> bool:
    """The batch report's cleared-denominator 2σ rule, verbatim — kept
    as the single shared definition for operator, twin, and tests."""
    lhs = (s_t * n_c - s_c * n_t) ** 2 * (n_t - 1) * (n_c - 1)
    rhs = AB_SIGMA * AB_SIGMA * (
        (q_t * n_t - s_t * s_t) * n_c * n_c * (n_c - 1)
        + (q_c * n_c - s_c * s_c) * n_t * n_t * (n_t - 1)
    )
    return lhs > rhs


def _monitor_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    etype = str(key[0])
    if state.exists:
        n_c, s_c, q_c, n_t, s_t, q_t, last = (int(v) for v in state.get)
    else:
        n_c = s_c = q_c = n_t = s_t = q_t = 0
        last = -1
    rows = []
    for pdf in pdfs:
        if not len(pdf):
            continue
        arms = (pdf["user_id"].astype("int64") % 2).to_numpy()
        cents = (
            (pdf["value"].astype("float64") * 100).round().astype("int64")
        ).to_numpy()
        for arm, c in zip(arms, cents):
            c = int(c)
            if arm == 0:
                n_c, s_c, q_c = n_c + 1, s_c + c, q_c + c * c
            else:
                n_t, s_t, q_t = n_t + 1, s_t + c, q_t + c * c
        # evaluate once per micro-batch chunk — the monitor's granularity
        if min(n_c, n_t) >= MIN_N:
            verdict = int(decide(n_c, s_c, q_c, n_t, s_t, q_t))
            if verdict != last:
                effect = (1_000_000 * s_t) // n_t - (1_000_000 * s_c) // n_c
                rows.append(
                    (etype, n_c + n_t, n_c, n_t, effect, bool(verdict))
                )
                last = verdict
    state.update((n_c, s_c, q_c, n_t, s_t, q_t, last))
    yield pd.DataFrame(
        rows, columns=[f.name for f in AB_MONITOR_OUTPUT_SCHEMA.fields]
    )


def streaming_ab_monitor(events: DataFrame) -> DataFrame:
    """Append-mode verdict transitions per event type. State is six
    integers plus the last verdict per key — stream-length-independent
    by construction (sufficient statistics, not rows)."""
    keyed = events.select("event_type", "user_id", "value")
    return keyed.groupBy("event_type").applyInPandasWithState(
        _monitor_fn,
        outputStructType=AB_MONITOR_OUTPUT_SCHEMA,
        stateStructType=_AB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
