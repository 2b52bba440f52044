"""Streaming k-anonymity release gate — the live twin of the batch
privacy pair (``plans/pipeline_quality.py::k_anonymity_audit`` /
``k_anonymity_generalize``): rows are HELD per quasi-identifier class
until the class's held backlog contains at least ``k`` rows from at
least ``l`` distinct users, then the whole backlog releases and the
class stays open — so nothing ever ships from a class a batch audit
would flag, without waiting for the day's batch job.

The release predicate is evaluated on the HELD set, not on cumulative
arrivals: the rows that actually ship at opening are themselves a
k-anonymous, l-diverse set (a cumulative counter would let a capped
class release fewer than k rows — the privacy property must hold for
the released data, which is the set the adversary sees).

Shape: ``applyInPandasWithState`` keyed by the QI class. Per-class
state is one flag and two capped arrays:

- ``opened`` — once true, rows pass through in their own batch and
  the held arrays are gone (state shrinks at the moment most
  operators' state would grow);
- held rows CAPPED AT ``max_held`` (must be ≥ k or the class could
  never open): a class hoarding rows without diversifying (one user
  spamming) drops its OLDEST held rows past the cap — suppressed
  exactly as the batch mechanism would suppress the class — and
  distinct-user accounting follows the held set via an incremental
  counter, so eviction and diversity stay O(1) per row;
- idle classes time out after ``ttl_ms`` of EVENT time beyond the
  class's newest row (event-time timeout, the stateful.py convention
  — a pending ProcessingTimeTimeout makes MicroBatchExecution's
  shouldRunAnotherBatch always-true and the query busy-loops empty
  micro-batches forever; watermark-driven timeouts only fire when
  data moves the stream forward): an UN-OPENED class's backlog is
  suppressed and its state cleared — an abandoned class cannot pin
  memory forever. An OPENED class is exempt (no timeout armed; a
  stale pre-open timeout that still fires re-stores the flag): its
  state is already the one-flag minimum, and dropping the flag would
  re-hold rows that arrive after an idle gap, making the released
  set depend on arrival timing.

Total state is ≤ n_classes × 2 × max_held longs — at 100 TB bounded
by QI cardinality and the knob, never by the stream. Determinism:
releases preserve arrival order (held order, then batch order) and
the decision depends only on the per-class held sequence, so a replay
of the same chunk sequence yields the same released set; with caps
and TTL untriggered the released set equals the batch filter "row's
class reaches k rows and l users" (pinned by tests, including a
kill-and-restart on the same checkpoint).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GATE_K = 5           # held rows before a class may release
GATE_L = 3           # distinct held users before a class may release
MAX_HELD = 1000      # held-row cap per class (beyond: oldest suppressed)
TTL_MS = 86_400_000  # idle class timeout (event-time ms past newest row)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("opened", T.BooleanType(), True),
        T.StructField("held_eids", T.ArrayType(T.LongType()), True),
        T.StructField("held_uids", T.ArrayType(T.LongType()), True),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("value_band", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
    ]
)


def _gate_fn(k: int, l_div: int, max_held: int, ttl_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (band,) = key
        if state.hasTimedOut:
            opened0 = state.exists and bool(state.get[0])
            if opened0:
                # an OPENED class must stay open across idle gaps — if
                # the flag were dropped here, rows arriving after a TTL
                # would be re-held (and possibly cap-suppressed), making
                # the released set depend on arrival timing. Keep the
                # flag (held arrays are already empty once opened) and
                # don't re-arm: an open class needs no timeout, its
                # state is the one-flag minimum already.
                state.update((True, [], []))
            else:
                # abandoned un-opened class: suppress the backlog,
                # free the state
                state.remove()
            return
        if state.exists:
            opened, eids0, uids0 = state.get
            held_eids, held_uids = deque(eids0), deque(uids0)
        else:
            opened, held_eids, held_uids = False, deque(), deque()
        uid_counts: dict[int, int] = {}
        for u in held_uids:
            uid_counts[u] = uid_counts.get(u, 0) + 1

        out_eids: list[int] = []
        out_uids: list[int] = []
        max_ts_ms = 0
        for pdf in pdfs:
            if len(pdf):
                max_ts_ms = max(
                    max_ts_ms, int(pdf["ts"].max().value // 1_000_000)
                )
            for eid, uid in zip(pdf["event_id"], pdf["user_id"]):
                eid, uid = int(eid), int(uid)
                if opened:
                    out_eids.append(eid)
                    out_uids.append(uid)
                    continue
                held_eids.append(eid)
                held_uids.append(uid)
                uid_counts[uid] = uid_counts.get(uid, 0) + 1
                if len(held_eids) > max_held:  # suppress oldest, O(1)
                    held_eids.popleft()
                    old = held_uids.popleft()
                    uid_counts[old] -= 1
                    if uid_counts[old] == 0:
                        del uid_counts[old]
                if len(held_eids) >= k and len(uid_counts) >= l_div:
                    opened = True
                    out_eids.extend(held_eids)
                    out_uids.extend(held_uids)
                    held_eids, held_uids = deque(), deque()
                    uid_counts = {}
        state.update(
            (True, [], [])
            if opened
            else (False, list(held_eids), list(held_uids))
        )
        # re-arm on activity from the class's newest event time (the
        # stateful.py convention): only genuinely idle UN-OPENED
        # classes evict — an opened class carries no timeout at all
        # (its state is the one-flag minimum and must survive idle
        # gaps so late rows pass instead of being re-held)
        if not opened:
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts_ms, wm_ms + 1) + ttl_ms)
        if out_eids:
            yield pd.DataFrame(
                {
                    "value_band": [band] * len(out_eids),
                    "event_id": out_eids,
                    "user_id": out_uids,
                }
            )

    return fn


def streaming_k_anon_gate(
    events: DataFrame,
    k: int = GATE_K,
    l_div: int = GATE_L,
    max_held: int = MAX_HELD,
    ttl_ms: int = TTL_MS,
    watermark: str = "35 days",
) -> DataFrame:
    """Gate a (user_id, event_id, value, ts) event stream: QI class =
    integer value hundred-band (the k_anonymity_audit band, on the
    4-column replay-chunk shape); released rows only."""
    if max_held < k:
        raise ValueError(
            f"max_held ({max_held}) < k ({k}): no class could ever "
            "hold k rows, so nothing would ever release"
        )
    cents = F.round(F.col("value") * 100).cast("long")
    classed = events.select(
        "ts",
        F.floor(cents / F.lit(10000.0)).cast("long").alias("value_band"),
        "event_id",
        "user_id",
    ).withWatermark("ts", watermark)
    return classed.groupBy("value_band").applyInPandasWithState(
        _gate_fn(k, l_div, max_held, ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
