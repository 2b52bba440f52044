"""Streaming CUSUM drift monitor — the live counterpart of
``plans/timeseries.py::cusum_changepoints``: the batch query locates a
mean shift retrospectively; this operator DETECTS one as the stream
runs (Page's classic CUSUM control chart), alarming on the hour the
cumulative drift crosses the decision threshold.

Spec (two-sided CUSUM against a frozen reference, all integers):

- Warm-up: the first ``REF_HOURS`` finalized hours per key accumulate
  the reference ``(ref_n, ref_s)``; no scoring during warm-up. The
  reference then FREEZES — a drifting mean must not absorb into the
  baseline it is tested against.
- Per finalized hour with count x, the scaled deviation is
  ``d = x·ref_n − ref_s`` (cross-multiplied |x − μ| — no division).
  One-sided statistics fold as ``s⁺ = max(0, s⁺ + d − slack)`` and
  ``s⁻ = max(0, s⁻ − d − slack)`` with ``slack = ref_s DIV 4``
  (a ¼-mean allowance, Page's k) and alarm when either exceeds
  ``h = 4·ref_s`` (four mean-hours of accumulated excess). An alarm
  resets its side to 0 — the standard restart, so episodes re-arm.
- Hours finalize on watermark advance over the dense hourly grid:
  gap hours are true zero volumes (an outage IS downward drift), and
  the event-time timeout finalizes hours even when no further event
  for the key ever arrives.

State per key: the frozen reference, two fold registers, the last
finalized hour, and the pending not-yet-watermarked counts — bounded
by the watermark horizon, never by stream length.

The batch twin (``batch_cusum_monitor``) runs the IDENTICAL fold
(shared ``fold_series``) over the dense hourly series per key via
applyInPandas — the recurrence's ``max(0, ·)`` has no closed
windowed form, so the batch side buckets by key exactly like
streaming does (the NMS precedent for order-dependent folds).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOUR_MS = 3_600_000
REF_HOURS = 24   # frozen-reference warm-up length
SLACK_DIV = 4    # slack = ref_s DIV 4  (¼ of the mean, scaled by ref_n)
H_MULT = 4       # alarm threshold = 4·ref_s (four mean-hours of excess)

CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("hour_start_ms", T.LongType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("warmed", T.BooleanType(), False),
        T.StructField("s_pos", T.LongType(), False),
        T.StructField("s_neg", T.LongType(), False),
        T.StructField("alarm_up", T.BooleanType(), False),
        T.StructField("alarm_down", T.BooleanType(), False),
    ]
)

_CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ref_n", T.LongType(), True),
        T.StructField("ref_s", T.LongType(), True),
        T.StructField("s_pos", T.LongType(), True),
        T.StructField("s_neg", T.LongType(), True),
        T.StructField("last_hour_ms", T.LongType(), True),
        T.StructField("pend_hours", T.ArrayType(T.LongType()), True),
        T.StructField("pend_counts", T.ArrayType(T.LongType()), True),
    ]
)


def fold_series(
    reg: tuple[int, int, int, int], hours: list[tuple[int, int]]
) -> tuple[tuple[int, int, int, int], list[tuple]]:
    """Fold finalized (hour_ms, count) observations through the CUSUM
    registers ``(ref_n, ref_s, s_pos, s_neg)``; returns the new
    registers and one output row per observation. Shared verbatim by
    the streaming operator, the batch twin, and the tests."""
    ref_n, ref_s, s_pos, s_neg = reg
    rows = []
    for h, c in hours:
        if ref_n < REF_HOURS:
            ref_n += 1
            ref_s += c
            rows.append((h, c, False, 0, 0, False, False))
            continue
        slack = ref_s // SLACK_DIV
        thr = H_MULT * ref_s
        d = c * ref_n - ref_s
        s_pos = max(0, s_pos + d - slack)
        s_neg = max(0, s_neg - d - slack)
        up = s_pos > thr
        down = s_neg > thr
        rows.append((h, c, True, s_pos, s_neg, up, down))
        if up:
            s_pos = 0
        if down:
            s_neg = 0
    return (ref_n, ref_s, s_pos, s_neg), rows


def _monitor_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    etype = str(key[0])
    if state.exists:
        ref_n, ref_s, s_pos, s_neg, last, ph, pc = state.get
        reg = (int(ref_n), int(ref_s), int(s_pos), int(s_neg))
        last = int(last)
        pending = {int(h): int(c) for h, c in zip(ph, pc)}
    else:
        reg = (0, 0, 0, 0)
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
    done: list[tuple[int, int]] = []
    while True:
        if last >= 0:
            nxt = last + HOUR_MS
        elif pending:
            nxt = min(pending)
        else:
            break
        if nxt + HOUR_MS > wm:
            break
        done.append((nxt, pending.pop(nxt, 0)))  # gap hour → true zero
        last = nxt
    reg, rows = fold_series(reg, done)
    items = sorted(pending.items())
    state.update(
        (*reg, last, [h for h, _ in items], [c for _, c in items])
    )
    nxt = last + HOUR_MS if last >= 0 else (min(pending) if pending else -1)
    if nxt >= 0:
        # strictly past the current watermark by the loop's exit condition
        state.setTimeoutTimestamp(nxt + HOUR_MS)
    yield pd.DataFrame(
        [(etype, *r) for r in rows],
        columns=[f.name for f in CUSUM_OUTPUT_SCHEMA.fields],
    )


def streaming_cusum_monitor(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Append-mode monitor rows: one immutable row per (key, hour) once
    the watermark clears the hour, zero-filled over gaps. Keys are the
    ~5 event types; state per key is 5 ints + the pending horizon."""
    keyed = events.withWatermark("ts", watermark).select("ts", "event_type")
    return keyed.groupBy("event_type").applyInPandasWithState(
        _monitor_fn,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def batch_cusum_monitor(events: DataFrame) -> DataFrame:
    """Batch twin over the full table: the same fold over each key's
    dense hourly series (zero-filled from the key's first hour through
    the GLOBAL last hour — exactly the grid the stream finalizes once
    the watermark passes the data's end).

    Scale: one corpus shuffle (the hourly aggregate, partial map-side),
    then one applyInPandas per key over its calendar-bounded series —
    the per-key fold is sequential by definition (Page's recurrence),
    the keys fan out.
    """
    hourly = (
        events.select(
            "event_type",
            ((F.unix_millis(F.col("ts")) / HOUR_MS).cast("long") * HOUR_MS)
            .alias("hour_ms"),
        )
        .groupBy("event_type", "hour_ms")
        .agg(F.count("*").alias("cnt"))
    )
    end = hourly.agg(F.max("hour_ms").alias("h_end"))
    dense_input = hourly.crossJoin(F.broadcast(end))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        etype = pdf["event_type"].iloc[0]
        h_end = int(pdf["h_end"].iloc[0])
        by = dict(zip(pdf["hour_ms"].astype(int), pdf["cnt"].astype(int)))
        series = []
        h = min(by)
        while h <= h_end:
            series.append((h, by.get(h, 0)))
            h += HOUR_MS
        _, rows = fold_series((0, 0, 0, 0), series)
        return pd.DataFrame(
            [(etype, *r) for r in rows],
            columns=[f.name for f in CUSUM_OUTPUT_SCHEMA.fields],
        )

    return dense_input.groupBy("event_type").applyInPandas(
        fold, schema=CUSUM_OUTPUT_SCHEMA
    )
