"""Streaming seasonal anomaly gate — the live twin of
``plans/timeseries.py::seasonal_anomalies``: hourly event volume scored
against its hour-of-day baseline AS THE STREAM RUNS, with bounded state
(24 cells, one per hour-of-day) and watermark-driven finalization.

Prequential spec (the standard streaming-anomaly formulation): hour h
is scored against the baseline accumulated from hours FINALIZED BEFORE
it — never against itself or the future — then absorbed into the
baseline UNLESS it was flagged (flagged hours are quarantined: one
absorbed spike inflates σ enough to mask a following outage). The
first ``MIN_BASELINE`` observations per cell are unflagged warm-up.
The batch query uses full-history leave-one-out instead (it can see
everything at once and excludes only the candidate itself); both share
the identical integer cross-multiplied 2σ test, so neither ever
computes a float.

Outage visibility: a cell's observations are exactly 24 h apart, so
when finalization advances it ZERO-FILLS every missing hour between
the last finalized hour and the watermark — an hour with no events at
all is scored as volume 0 (and flagged once the baseline is tight),
including total-feed outages where NO key ever receives another event:
the event-time timeout re-invokes the cell on watermark advance alone.

State per cell: the integer baseline (n, Σc, Σc²), the last finalized
hour, and the pending not-yet-watermarked hour counts — bounded by the
watermark horizon, never by stream length. Append-mode output: a
finalized hour is immutable.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.timeseries import ANOM_SIGMA  # ONE sigma constant, shared
                                           # with the batch query so the
                                           # two tests pin the same rule

HOUR_MS = 3_600_000
DAY_MS = 24 * HOUR_MS
MIN_BASELINE = 5    # warm-up observations per cell before flagging

ANOMALY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("hour_start_ms", T.LongType(), False),
        T.StructField("hod", T.IntegerType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("baseline_n", T.LongType(), False),
        T.StructField("dev", T.LongType(), False),
        T.StructField("thr", T.LongType(), False),
        T.StructField("is_anomaly", T.BooleanType(), False),
    ]
)

_ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), True),
        T.StructField("s", T.LongType(), True),
        T.StructField("q", T.LongType(), True),
        T.StructField("last_hour_ms", T.LongType(), True),
        T.StructField("pend_hours", T.ArrayType(T.LongType()), True),
        T.StructField("pend_counts", T.ArrayType(T.LongType()), True),
    ]
)


def score_hour(c: int, n: int, s: int, q: int) -> tuple[int, int, bool]:
    """(dev, thr, is_anomaly) of count ``c`` against baseline (n,Σc,Σc²)
    — the cross-multiplied |c−μ| > σ·ANOM_SIGMA test in pure ints;
    shared by the operator and the test reference."""
    dev = c * n - s
    thr = ANOM_SIGMA * ANOM_SIGMA * (n * q - s * s)
    return dev, thr, n >= MIN_BASELINE and dev * dev > thr


def _gate_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (hod,) = (int(key[0]),)
    if state.exists:
        n, s, q, last, ph, pc = state.get
        n, s, q, last = int(n), int(s), int(q), int(last)
        pending = {int(h): int(c) for h, c in zip(ph, pc)}
    else:
        n = s = q = 0
        last = -1
        pending = {}
    if not state.hasTimedOut:
        for pdf in pdfs:
            if len(pdf):
                hours = (
                    pdf["ts"].astype("int64") // 10**6 // HOUR_MS
                ) * HOUR_MS
                for h, c in hours.value_counts().items():
                    pending[int(h)] = pending.get(int(h), 0) + int(c)
    wm = state.getCurrentWatermarkMs()
    rows = []
    while True:
        if last >= 0:
            nxt = last + DAY_MS
        elif pending:
            nxt = min(pending)
        else:
            break
        if nxt + HOUR_MS > wm:
            break
        c = pending.pop(nxt, 0)  # missing hour → true zero volume
        dev, thr, anom = score_hour(c, n, s, q)
        rows.append((nxt, hod, c, n, dev, thr, anom))
        if not anom:
            # quarantine flagged hours from the baseline: one absorbed
            # spike inflates sigma enough to mask the NEXT anomaly (a
            # following outage scores under threshold) — contamination
            # resistance the batch LOO form doesn't need, because LOO
            # sees the full history at once and excludes only itself
            n, s, q = n + 1, s + c, q + c * c
        last = nxt
    items = sorted(pending.items())
    state.update(
        (n, s, q, last, [h for h, _ in items], [c for _, c in items])
    )
    # re-arm at the next boundary; the loop's exit condition guarantees
    # it is strictly past the current watermark, as the API requires
    nxt = last + DAY_MS if last >= 0 else (min(pending) if pending else -1)
    if nxt >= 0:
        state.setTimeoutTimestamp(nxt + HOUR_MS)
    yield pd.DataFrame(
        rows,
        columns=[
            "hour_start_ms",
            "hod",
            "cnt",
            "baseline_n",
            "dev",
            "thr",
            "is_anomaly",
        ],
    )


def streaming_seasonal_anomalies(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Append-mode finalized-hour scores: one immutable row per
    (hour, hour-of-day cell) once the watermark clears the hour,
    including zero-filled gap hours between observations. State is 24
    cells × (3 ints + the pending horizon)."""
    # hod derives from the EPOCH grid, not the session-timezone hour:
    # the finalization loop steps pending hours in fixed 24h epoch-ms
    # increments, and a DST-observing session timezone would shift
    # F.hour() off that grid mid-stream, stranding pending counts
    # forever (and emitting false zero-volume hours). Epoch-derived
    # hod is grid-consistent in every timezone; under the repo's
    # pinned-UTC sessions it equals F.hour(ts).
    keyed = events.withWatermark("ts", watermark).select(
        "ts",
        (
            (F.unix_millis(F.col("ts")) / HOUR_MS).cast("long") % 24
        ).cast("int").alias("hod"),
    )
    return keyed.groupBy("hod").applyInPandasWithState(
        _gate_fn,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=_ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
