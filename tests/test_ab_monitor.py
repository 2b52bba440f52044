"""Streaming A/B monitor (streaming/ab_monitor.py): final-verdict
parity with the batch rule, flip-only emission, and checkpoint-restart
reproducibility."""

from __future__ import annotations

import datetime as dt
import os

import duckdb
from conftest import events_chunk_schema, write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.ab_monitor import (
    MIN_N,
    decide,
    streaming_ab_monitor,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    run_to_memory,
    stream_events,
)

SF = "/root/testdata/sf0.001"


def test_final_verdict_matches_batch_rule_on_replay(spark, sf_dir):
    q = run_to_memory(
        streaming_ab_monitor(stream_events(spark, sf_dir)), "ab_mon_out"
    )
    try:
        rows = spark.sql(
            "SELECT * FROM ab_mon_out ORDER BY event_type, rows_seen"
        ).collect()
    finally:
        q.stop()
    base = duckdb.sql(
        f"SELECT event_type, user_id % 2, CAST(round(value*100) AS BIGINT) "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    stats: dict[str, list[int]] = {}
    for et, arm, c in base:
        s = stats.setdefault(et, [0, 0, 0, 0, 0, 0])
        off = 0 if arm == 0 else 3
        s[off] += 1
        s[off + 1] += c
        s[off + 2] += c * c
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, s in stats.items():
        if min(s[0], s[3]) < MIN_N:
            continue
        want_final = decide(*s)
        emitted = by_type.get(et, [])
        assert emitted, f"{et}: no verdict emitted despite n >= MIN_N"
        assert emitted[-1]["significant"] == want_final
        # flip-only contract: consecutive emissions alternate
        verdicts = [r["significant"] for r in emitted]
        assert all(a != b for a, b in zip(verdicts, verdicts[1:]))
        # counts at the last flip cannot exceed the totals
        assert emitted[-1]["n_c"] <= s[0] and emitted[-1]["n_t"] <= s[3]


T0 = dt.datetime(2024, 1, 1)


def _chunk(uid_base, n, value, start_min):
    return [
        (uid_base + i, uid_base * 1000 + i, value, T0 + dt.timedelta(minutes=start_min + i))
        for i in range(n)
    ]


def test_injected_shift_flips_verdict_and_restart_reproduces(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    # f1: both arms identical (users 0/1 alternate arms via uid % 2) —
    # verdict False once MIN_N reached. f2: treatment arm (odd uids)
    # jumps 4x — verdict flips True.
    rows1 = []
    for i in range(2 * MIN_N + 10):
        rows1.append((i, i, 100.0, T0 + dt.timedelta(minutes=i)))
    rows2 = []
    for i in range(200, 200 + 2 * MIN_N):
        val = 400.0 if i % 2 else 100.0
        rows2.append((i, i, val, T0 + dt.timedelta(minutes=i)))
    write_events_chunk(spark, src, "f1", rows1)

    got: list[tuple] = []

    def start():
        from pyspark.sql import functions as F

        stream = (
            spark.readStream.schema(events_chunk_schema())
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumn("event_type", F.lit("evt"))
        )

        def sink(df, _bid):
            for r in df.collect():
                got.append((r.rows_seen, r.n_c, r.n_t, r.significant))

        return (
            streaming_ab_monitor(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert got == [(2 * MIN_N + 10, MIN_N + 5, MIN_N + 5, False)]

    write_events_chunk(spark, src, "f2", rows2)
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert len(got) == 2
    rows_seen, n_c, n_t, sig = got[1]
    assert sig is True  # the injected 4x shift is detected
    assert rows_seen == 4 * MIN_N + 10
    # deterministic replay: wipe the sink log, rerun from scratch with a
    # fresh checkpoint — identical flip history
    got2: list[tuple] = []
    ckpt2 = str(tmp_path / "ckpt2")

    def start2():
        from pyspark.sql import functions as F

        stream = (
            spark.readStream.schema(events_chunk_schema())
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumn("event_type", F.lit("evt"))
        )

        def sink(df, _bid):
            for r in df.collect():
                got2.append((r.rows_seen, r.n_c, r.n_t, r.significant))

        return (
            streaming_ab_monitor(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt2)
            .start()
        )

    q3 = start2()
    q3.processAllAvailable()
    q3.stop()
    assert got2 == got
