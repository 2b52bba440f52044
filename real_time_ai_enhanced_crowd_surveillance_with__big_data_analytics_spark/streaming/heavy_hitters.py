"""Streaming heavy hitters with BOUNDED state: distributed
Space-Saving (Metwally et al., the mergeable-summary formulation) over
an unbounded event stream — the streaming analog of
``plans/stats.py::key_skew_report``. The batch report diagnoses skew
after the fact; this operator tracks the heaviest keys live, with
memory that does NOT grow with the number of distinct keys.

Shape: keys hash into ``n_cells`` state cells (``user_id % n_cells``);
each cell holds a Space-Saving summary of at most ``capacity``
counters as three parallel arrays in its ``applyInPandasWithState``
cell. Per micro-batch a cell merges its batch counts (pre-aggregated
in pandas, so the Python loop runs over DISTINCT batch users, not
rows) and emits its full summary tagged with a per-cell version;
``heavy_hitters_snapshot`` then reduces any collected output to the
current top-k by taking each cell's newest version and summing.

Guarantees (standard Space-Saving, preserved under this sharding
because each user hashes to exactly ONE cell):
- for every tracked user: ``est − err ≤ true ≤ est``;
- every user whose true count exceeds its cell's min-counter (≤
  cell_rows / capacity) is present in that cell's summary;
- with ``capacity`` ≥ distinct users per cell the summary is EXACT
  (err = 0) and the snapshot equals the batch groupBy-count top-k.

At 100 TB: total state is ``n_cells × capacity`` counters regardless
of key cardinality — a few MB where per-key counting state would be
the full distinct-key set. No timeout is needed: the store is bounded
by construction, so cells never need eviction (contrast
stateful.py's TTL'd per-camera cells).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CAPACITY = 16  # counters per cell
N_CELLS = 8    # state cells (hash shards)

HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("cell", T.LongType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("est", T.LongType(), False),
        T.StructField("err", T.LongType(), False),
    ]
)

_HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
        T.StructField("errs", T.ArrayType(T.LongType()), True),
        T.StructField("version", T.LongType(), True),
    ]
)


def _space_saving_merge(
    summary: dict[int, tuple[int, int]], batch_counts: dict[int, int], capacity: int
) -> None:
    """Classic Space-Saving update, in place: known users accumulate;
    new users take a free slot or evict the current min counter m,
    entering with count m+c and error m."""
    for user, c in batch_counts.items():
        if user in summary:
            cnt, err = summary[user]
            summary[user] = (cnt + c, err)
        elif len(summary) < capacity:
            summary[user] = (c, 0)
        else:
            # tie-break equal-count evictions on user_id: dict insertion
            # order varies with pandas value_counts ordering of tied
            # users, and a nondeterministic surviving-counter set breaks
            # the repo's deterministic-output convention (ADVICE r5)
            evict_user = min(summary, key=lambda u: (summary[u][0], u))
            m = summary[evict_user][0]
            del summary[evict_user]
            summary[user] = (m + c, m)


def _hh_fn(capacity: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (cell,) = key
        if state.exists:
            users, counts, errs, version = state.get
            summary = {
                int(u): (int(c), int(e))
                for u, c, e in zip(users, counts, errs)
            }
        else:
            summary, version = {}, 0
        batch: dict[int, int] = {}
        for pdf in pdfs:
            if len(pdf):
                for u, c in pdf["user_id"].value_counts().items():
                    batch[int(u)] = batch.get(int(u), 0) + int(c)
        _space_saving_merge(summary, batch, capacity)
        version += 1
        items = sorted(summary.items())
        state.update(
            (
                [u for u, _ in items],
                [c for _, (c, _) in items],
                [e for _, (_, e) in items],
                version,
            )
        )
        yield pd.DataFrame(
            {
                "cell": [cell] * len(items),
                "version": [version] * len(items),
                "user_id": [u for u, _ in items],
                "est": [c for _, (c, _) in items],
                "err": [e for _, (_, e) in items],
            }
        )

    return fn


def streaming_heavy_hitters(
    events: DataFrame,
    capacity: int = CAPACITY,
    n_cells: int = N_CELLS,
) -> DataFrame:
    """(cell, version, user_id, est, err) per micro-batch: each cell's
    full Space-Saving summary after merging the batch. Update-style
    emission (a later version supersedes an earlier one for its cell);
    pair with :func:`heavy_hitters_snapshot` to reduce collected
    output to the live top-k."""
    cells = events.select(
        F.pmod(F.col("user_id"), F.lit(n_cells)).alias("cell"), "user_id"
    )
    return cells.groupBy("cell").applyInPandasWithState(
        _hh_fn(capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_snapshot(emitted: DataFrame, top: int = 10) -> DataFrame:
    """Reduce accumulated update-mode output (e.g. a memory sink) to
    the CURRENT top-``top``: keep each cell's newest version, then rank
    users by estimate with the deterministic (est desc, user_id asc)
    tiebreak — sort+limit first (TakeOrderedAndProject), then the rank
    over ≤ top rows, the repo's cut-then-rank rule."""
    from pyspark.sql import Window

    latest = F.max("version").over(Window.partitionBy("cell"))
    current = (
        emitted.withColumn("_latest", latest)
        .filter(F.col("version") == F.col("_latest"))
        .select("user_id", "est", "err")
    )
    cut = current.orderBy(F.col("est").desc(), F.col("user_id").asc()).limit(
        top
    )
    w = Window.orderBy(F.col("est").desc(), F.col("user_id").asc())
    return cut.select(
        F.row_number().over(w).alias("rank"), "user_id", "est", "err"
    )


# --- event-time windowed heavy hitters ---------------------------------------

HOUR_MS = 3_600_000

WINDOWED_HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("hour_start_ms", T.LongType(), False),
        T.StructField("cell", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("est", T.LongType(), False),
        T.StructField("err", T.LongType(), False),
    ]
)

_WINDOWED_HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
        T.StructField("errs", T.ArrayType(T.LongType()), True),
    ]
)


def _windowed_hh_fn(capacity: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        # key values arrive as numpy scalars; setTimeoutTimestamp JSON-
        # serializes its argument, so coerce to Python int up front
        hour_start_ms, cell = int(key[0]), int(key[1])
        if state.hasTimedOut:
            # watermark passed the hour: FINALIZE — emit once, drop the
            # cell. Append-mode-safe because a finalized window is
            # immutable (the late-row trade is the watermark's, same as
            # any windowed agg).
            users, counts, errs = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "hour_start_ms": [hour_start_ms] * len(users),
                    "cell": [cell] * len(users),
                    "user_id": list(users),
                    "est": list(counts),
                    "err": list(errs),
                }
            )
            return
        if state.exists:
            users, counts, errs = state.get
            summary = {
                int(u): (int(c), int(e))
                for u, c, e in zip(users, counts, errs)
            }
        else:
            summary = {}
        batch: dict[int, int] = {}
        for pdf in pdfs:
            if len(pdf):
                for u, c in pdf["user_id"].value_counts().items():
                    batch[int(u)] = batch.get(int(u), 0) + int(c)
        _space_saving_merge(summary, batch, capacity)
        items = sorted(summary.items())
        state.update(
            (
                [u for u, _ in items],
                [c for _, (c, _) in items],
                [e for _, (_, e) in items],
            )
        )
        # finalize when the watermark clears the end of this hour
        state.setTimeoutTimestamp(hour_start_ms + HOUR_MS)
        yield pd.DataFrame(
            {
                "hour_start_ms": [],
                "cell": [],
                "user_id": [],
                "est": [],
                "err": [],
            }
        )

    return fn


def streaming_windowed_heavy_hitters(
    events: DataFrame,
    capacity: int = CAPACITY,
    n_cells: int = N_CELLS,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-HOUR heavy hitters, finalized on watermark: state cells are
    keyed (hour, user_id % n_cells), each a bounded Space-Saving
    summary; when the event-time watermark passes the hour end the cell
    emits its final summary ONCE and is removed — append-mode output of
    immutable rows, with state bounded by (open hours × n_cells ×
    capacity), never by key cardinality. The batch twin is an exact
    per-hour groupBy count; parity holds exactly when capacity covers
    each (hour, cell) key set (tests). This is the finalize-on-
    watermark complement to :func:`streaming_heavy_hitters`'s live
    update-mode summaries."""
    cells = events.withWatermark("ts", watermark).select(
        "ts",
        (
            (F.unix_millis(F.col("ts")) / HOUR_MS).cast("long") * HOUR_MS
        ).alias("hour_start_ms"),
        F.pmod(F.col("user_id"), F.lit(n_cells)).alias("cell"),
        "user_id",
    )
    return cells.groupBy("hour_start_ms", "cell").applyInPandasWithState(
        _windowed_hh_fn(capacity),
        outputStructType=WINDOWED_HH_OUTPUT_SCHEMA,
        stateStructType=_WINDOWED_HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
