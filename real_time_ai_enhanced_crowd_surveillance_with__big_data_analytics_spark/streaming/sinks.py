"""Side-effecting sinks with effectively-once semantics (SURVEY.md
§2.9 delivery; S5-S7).

Reference sinks: cv2.imshow (main.py:177,261), a fire-and-forget alarm
thread that can double-fire across the two duplicated trigger blocks
(main.py:180-182 vs 264-266), and a declared-but-unused email flag
(main.py:22-23). Spark mapping: ``foreachBatch`` with an idempotency
key — replays of a micro-batch (at-least-once delivery) dedupe on the
key, so the alarm fires effectively once per episode.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IdempotentAlertSink:
    """foreachBatch target that invokes ``action`` once per alert key.

    The key is (user_id, episode) — the alarm episode identity — so a
    retried micro-batch cannot re-fire an alarm. In production the seen
    set lives in a transactional store (the batchId is the transaction
    token); here it is in-memory for tests.
    """

    def __init__(self, action: Callable[[tuple], None] | None = None):
        self.seen: set[tuple] = set()
        self.fired: list[tuple] = []
        self._action = action

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        keys = [
            (r.user_id, r.episode)
            for r in batch_df.select("user_id", "episode").collect()
        ]
        for key in keys:
            if key in self.seen:
                continue
            self.seen.add(key)
            self.fired.append(key)
            if self._action is not None:
                self._action(key)


def alert_stream(edges: DataFrame, sink: IdempotentAlertSink):
    """Wire an edge stream (streaming_rising_edges output) to the sink."""
    return (
        edges.writeStream.outputMode("append")
        .foreachBatch(sink)
        .start()
    )
