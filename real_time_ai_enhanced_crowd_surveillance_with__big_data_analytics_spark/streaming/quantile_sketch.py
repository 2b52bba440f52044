"""Streaming quantiles with BOUNDED state: a deterministic KLL-style
compactor sketch over an unbounded value stream — the streaming analog
of ``plans/relational.py::value_percentiles`` (and the live form of
``approx_aggregates``' t-digest columns), built on the same
cell-sharded ``applyInPandasWithState`` skeleton as
``heavy_hitters.py``.

Sketch: a compactor stack. Level ``i`` holds at most ``k`` values,
each representing ``2^i`` input values. Incoming values enter level 0;
a full level is sorted and every OTHER value (even indices — the
deterministic variant of KLL's coin flip, chosen because this repo
prizes reproducibility over the randomized bound's constant) is
promoted to the next level. Total state is O(k · log2(n/k)) values
per cell REGARDLESS of the stream's length or value cardinality.

Guarantees:
- weights are conserved exactly: Σ 2^level over stored values = number
  of ingested values (pinned by test) — so estimated CDF mass is exact
  at the ends;
- each compaction at level i perturbs any rank by ≤ 2^i; with the
  deterministic even-index rule the worst-case rank error after n
  ingests is O(log(n/k) · n/k) — the tests assert the empirically
  far tighter ~n/k band on adversarial-ordered streams;
- sketches MERGE by concatenating levels then recompacting (the
  snapshot path), so per-cell sharding loses nothing.

Shape: values hash to ``n_cells`` state cells by event_id (value-
independent, so each cell sees an unbiased subsequence); each cell
updates its stack per micro-batch (vectorized numpy sort/slice — the
Python loop is over LEVELS, not values) and emits its full sketch
tagged with a version. ``quantile_snapshot`` keeps each cell's newest
version, merges the cells, and evaluates weighted quantiles.

At 100 TB: state is n_cells × k × log-levels floats — kilobytes where
exact per-key percentile state would be the full value multiset.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

K = 64       # values per compactor level
N_CELLS = 8  # state cells (hash shards)

QS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("cell", T.LongType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("item", T.DoubleType(), False),
    ]
)

_QS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("levels", T.ArrayType(T.IntegerType()), True),
        T.StructField("items", T.ArrayType(T.DoubleType()), True),
        T.StructField("version", T.LongType(), True),
        T.StructField("n_seen", T.LongType(), True),
    ]
)


def kll_update(
    levels: list[np.ndarray], values: np.ndarray, k: int = K
) -> list[np.ndarray]:
    """Ingest ``values`` into the compactor stack, in place-ish;
    returns the (possibly longer) stack. Deterministic: full levels
    sort and promote their even-index elements."""
    if not levels:
        levels = [np.empty(0, dtype=np.float64)]
    levels[0] = np.concatenate([levels[0], values.astype(np.float64)])
    i = 0
    while i < len(levels):
        if len(levels[i]) <= k:
            i += 1
            continue
        full = np.sort(levels[i], kind="stable")
        # weight conservation requires compacting an EVEN count: each
        # promoted (even-index) value absorbs its odd neighbour's
        # weight — 2^(i+1)·(L/2) == 2^i·L exactly. An odd straggler
        # (the max, deterministically) stays at level i.
        if len(full) % 2:
            keep, full = full[-1:], full[:-1]
        else:
            keep = full[:0]
        promoted = full[::2]
        levels[i] = keep
        if i + 1 == len(levels):
            levels.append(np.empty(0, dtype=np.float64))
        levels[i + 1] = np.concatenate([levels[i + 1], promoted])
        i += 1
    return levels


def kll_weighted_items(levels: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """(items, weights) across the stack."""
    items, weights = [], []
    for i, lv in enumerate(levels):
        if len(lv):
            items.append(lv)
            weights.append(np.full(len(lv), 1 << i, dtype=np.int64))
    if not items:
        return np.empty(0), np.empty(0, dtype=np.int64)
    return np.concatenate(items), np.concatenate(weights)


def kll_quantile(levels: list[np.ndarray], q: float) -> float:
    items, weights = kll_weighted_items(levels)
    if len(items) == 0:
        return float("nan")
    order = np.argsort(items, kind="stable")
    items, weights = items[order], weights[order]
    cum = np.cumsum(weights)
    target = q * cum[-1]
    return float(items[int(np.searchsorted(cum, target))])


def _pack(levels: list[np.ndarray]) -> tuple[list[int], list[float]]:
    lvl, its = [], []
    for i, lv in enumerate(levels):
        lvl.extend([i] * len(lv))
        its.extend(float(v) for v in lv)
    return lvl, its


def _unpack(lvl: list[int], its: list[float]) -> list[np.ndarray]:
    n_levels = (max(lvl) + 1) if lvl else 1
    out = [np.empty(0, dtype=np.float64) for _ in range(n_levels)]
    by: dict[int, list[float]] = {}
    for l, v in zip(lvl, its):
        by.setdefault(int(l), []).append(float(v))
    for l, vs in by.items():
        out[l] = np.asarray(vs, dtype=np.float64)
    return out


def _qs_fn(k: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (cell,) = key
        if state.exists:
            lvl, its, version, n_seen = state.get
            levels = _unpack(list(lvl), list(its))
        else:
            levels, version, n_seen = [], 0, 0
        vals = []
        for pdf in pdfs:
            if len(pdf):
                vals.append(pdf["value"].to_numpy(dtype=np.float64))
        if vals:
            batch = np.concatenate(vals)
            levels = kll_update(levels, batch, k)
            n_seen += len(batch)
        version += 1
        lvl, its = _pack(levels)
        state.update((lvl, its, version, int(n_seen)))
        yield pd.DataFrame(
            {
                "cell": [cell] * len(lvl),
                "version": [version] * len(lvl),
                "level": pd.array(lvl, dtype="int32"),
                "item": its,
            }
        )

    return fn


def streaming_quantile_sketch(
    events: DataFrame, k: int = K, n_cells: int = N_CELLS
) -> DataFrame:
    """(cell, version, level, item) per micro-batch: each cell's full
    compactor stack after ingesting the batch. Update-mode emission;
    pair with :func:`quantile_snapshot`."""
    cells = events.select(
        F.pmod(F.col("event_id"), F.lit(n_cells)).alias("cell"), "value"
    )
    return cells.groupBy("cell").applyInPandasWithState(
        _qs_fn(k),
        outputStructType=QS_OUTPUT_SCHEMA,
        stateStructType=_QS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quantile_snapshot(emitted: DataFrame, qs: tuple[float, ...] = (0.5, 0.95)):
    """Reduce accumulated update-mode output to current quantile
    estimates: newest version per cell, merge all cells' (level, item)
    pairs (KLL merge = concatenate; no recompaction needed to QUERY),
    evaluate weighted quantiles. Returns {q: estimate}."""
    from pyspark.sql import Window

    latest = F.max("version").over(Window.partitionBy("cell"))
    rows = (
        emitted.withColumn("_latest", latest)
        .filter(F.col("version") == F.col("_latest"))
        .select("level", "item")
        .collect()
    )
    levels = _unpack([r.level for r in rows], [r.item for r in rows])
    return {q: kll_quantile(levels, q) for q in qs}
