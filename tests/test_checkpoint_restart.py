"""Checkpoint recovery (SURVEY.md §2.9 delivery semantics): a stateful
streaming query killed mid-replay and restarted from its checkpoint
must neither lose nor duplicate state — the restarted query's final
answer equals the batch answer, with the first query's progress
genuinely partial (so recovery actually resumed, not recomputed).
"""

from __future__ import annotations

import datetime as dt
import os

from conftest import events_chunk_schema, write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.stateful import (
    streaming_rising_edges,
)

T0 = dt.datetime(2024, 1, 1)


def test_stateful_query_resumes_from_checkpoint(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    # alternating low/high per user: every high is a rising edge only
    # if the low in between was seen exactly once
    rows1 = [(1, 1, 200.0, T0), (1, 2, 100.0, T0), (2, 3, 300.0, T0)]
    rows2 = [(1, 4, 250.0, T0), (2, 5, 100.0, T0), (2, 6, 400.0, T0)]
    write_events_chunk(spark, src, "f1", rows1)

    got: dict = {}
    emissions: list[tuple] = []  # every sunk row, duplicates included

    def start():
        # foreachBatch, not the memory sink: only fault-tolerant sinks
        # support recovering from a checkpoint
        stream = (
            spark.readStream.schema(events_chunk_schema())
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def sink(df, _bid):
            for r in df.collect():
                emissions.append((r.user_id, r.event_id))
                got[(r.user_id, r.event_id)] = r.episode

        return (
            streaming_rising_edges(stream, threshold=150.0)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()  # "crash" between micro-batches
    assert got == {(1, 1): 1, (2, 3): 1}  # partial progress only

    write_events_chunk(spark, src, "f2", rows2)
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    # resumed state: user 1's episode counter continues at 2 (the lag
    # state survived the restart), user 2 re-arms after the low then
    # fires episode 2; nothing from f1 is re-emitted or double-counted
    assert got == {(1, 1): 1, (2, 3): 1, (1, 4): 2, (2, 6): 2}
    # committed micro-batches were not replayed: each edge was sunk
    # exactly once across both query incarnations
    assert sorted(emissions) == sorted(got)
