"""Rising-edge alarm on the Spark 4 ``transformWithStateInPandas``
API — the successor to ``applyInPandasWithState`` (stateful.py), same
reconciled reference semantics (fire once per False→True transition,
main.py:171-185 vs 264-266).

Why both exist: applyInPandasWithState hands the whole per-key state
in/out each micro-batch; transformWithState gives named, typed state
cells (ValueState here; List/MapState for richer operators) with
lifecycle hooks and timers — the API a production engine should expose
going forward. The parity test pins TWS ≡ applyInPandasWithState ≡
batch lag (operators/edge_trigger.py) on the replayed events table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # Spark >= 4.0; the TWS python driver-worker also needs protobuf
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    HAS_TWS = True
except ImportError:  # pragma: no cover - older runtimes / missing protobuf
    HAS_TWS = False
    StatefulProcessor = object  # type: ignore[assignment,misc]

from .stateful import EDGE_OUTPUT_SCHEMA

_STATE_DDL = "prev boolean, episodes bigint"


class _EdgeProcessor(StatefulProcessor):
    """Per-key ValueState (prev flag, episode counter)."""

    def __init__(self, threshold: float):
        self._threshold = threshold

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState("edge", _STATE_DDL)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev, episodes = (
            self._state.get() if self._state.exists() else (False, 0)
        )
        out = []
        for pdf in rows:
            pdf = pdf.sort_values("event_id")
            for event_id, value in zip(pdf["event_id"], pdf["value"]):
                cond = bool(value > self._threshold)
                if cond and not prev:
                    episodes += 1
                    out.append((user_id, int(event_id), float(value), episodes))
                prev = cond
        self._state.update((prev, episodes))
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "value", "episode"]
        )

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


def streaming_rising_edges_tws(
    events: DataFrame, threshold: float = 150.0
) -> DataFrame:
    """transformWithStateInPandas twin of
    stateful.streaming_rising_edges: O(1) named state per key in the
    state store, hash-partitioned by user — the millions-of-cameras
    layout at 100 TB. transformWithState requires the RocksDB state
    store (incremental checkpointing; the HDFS-backed default keeps
    full state in executor heap), so pin it here — it is the right
    provider for large keyed state regardless."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_EdgeProcessor(threshold),
            outputStructType=EDGE_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
