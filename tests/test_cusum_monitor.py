"""Streaming CUSUM drift monitor (streaming/cusum_monitor.py):
fold-rule unit semantics, stream == batch parity over the ordered
replay, and checkpoint-restart recovery."""

from __future__ import annotations

import datetime as dt
import os

from conftest import events_chunk_schema, write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.cusum_monitor import (
    H_MULT,
    HOUR_MS,
    REF_HOURS,
    SLACK_DIV,
    batch_cusum_monitor,
    fold_series,
    streaming_cusum_monitor,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.runner import (
    run_to_memory,
    stream_events,
)


def _series(counts):
    return [(i * HOUR_MS, c) for i, c in enumerate(counts)]


def test_fold_warmup_freezes_reference_and_alarms_on_shift():
    # 24 warm-up hours at 10/h, then a sustained jump to 20/h
    reg, rows = fold_series((0, 0, 0, 0), _series([10] * REF_HOURS + [20] * 10))
    ref_n, ref_s, _, _ = reg
    assert (ref_n, ref_s) == (REF_HOURS, 240)
    warm = rows[:REF_HOURS]
    assert all(not r[2] for r in warm)  # warmed=False during warm-up
    scored = rows[REF_HOURS:]
    assert all(r[2] for r in scored)
    # d per shifted hour = 20*24 - 240 = 240; slack = 60 -> s_pos += 180
    # threshold = 4*240 = 960 -> alarm on the 6th shifted hour (s=1080)
    ups = [r[5] for r in scored]
    assert ups.index(True) == 5
    # reset after alarm: the register restarts, next alarm ~6 hours on
    assert rows[REF_HOURS + 5][3] == 1080
    assert rows[REF_HOURS + 6][3] == 180
    assert not any(r[6] for r in scored)  # no downward alarm on a jump


def test_fold_detects_outage_as_downward_drift():
    reg, rows = fold_series((0, 0, 0, 0), _series([10] * REF_HOURS + [0] * 6))
    scored = rows[REF_HOURS:]
    # d = -240, slack 60 -> s_neg += 180/h; threshold 960 -> hour 6
    downs = [r[6] for r in scored]
    assert downs.index(True) == 5
    assert not any(r[5] for r in scored)


def test_fold_stays_quiet_within_slack():
    # ±2 around mean 10: |d| = 48 < slack 60 -> registers never leave 0
    counts = [10] * REF_HOURS + [12, 8] * 10
    _, rows = fold_series((0, 0, 0, 0), _series(counts))
    assert all(r[3] == 0 and r[4] == 0 for r in rows[REF_HOURS:])


def _key(r):
    return (r.event_type, r.hour_start_ms)


def test_stream_matches_batch_on_finalized_hours(spark, sf_dir):
    q = run_to_memory(
        streaming_cusum_monitor(stream_events(spark, sf_dir)), "cusum_out"
    )
    try:
        got = {
            _key(r): (r.cnt, r.warmed, r.s_pos, r.s_neg, r.alarm_up, r.alarm_down)
            for r in spark.sql("SELECT * FROM cusum_out").collect()
        }
    finally:
        q.stop()
    want = {
        _key(r): (r.cnt, r.warmed, r.s_pos, r.s_neg, r.alarm_up, r.alarm_down)
        for r in batch_cusum_monitor(load_table(spark, "events", sf_dir)).collect()
    }
    assert got, "stream finalized nothing — watermark never advanced"
    # every finalized stream row must equal the batch fold exactly; the
    # stream's tail stops at the watermark, the batch's at the last hour
    for k, v in got.items():
        assert want[k] == v, k
    # the stream must have gotten past warm-up for the parity to bite
    assert any(v[1] for v in got.values())
    # per key, the stream's coverage is a prefix of the batch grid
    for etype in {k[0] for k in want}:
        bh = sorted(h for t, h in want if t == etype)
        sh = sorted(h for t, h in got if t == etype)
        assert sh == bh[: len(sh)]


T0 = dt.datetime(2024, 1, 1)


def test_monitor_resumes_from_checkpoint(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    # 2-hour warm-up is impossible to shrink (REF_HOURS is module spec),
    # so drive enough hours that finalization crosses the restart: one
    # event per hour for REF_HOURS + 8 hours, split across two files
    split = REF_HOURS // 2
    rows1 = [
        (1, i, 100.0, T0 + dt.timedelta(hours=i)) for i in range(split)
    ]
    rows2 = [
        (1, i, 100.0, T0 + dt.timedelta(hours=i))
        for i in range(split, REF_HOURS + 8)
    ]
    write_events_chunk(spark, src, "f1", rows1)

    got: dict = {}

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
                got[_key(r)] = (r.cnt, r.warmed, r.s_pos, r.s_neg)

        return (
            streaming_cusum_monitor(stream, watermark="1 minute")
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()  # crash between micro-batches
    n_before = len(got)
    assert 0 < n_before < REF_HOURS + 7  # genuinely partial progress

    write_events_chunk(spark, src, "f2", rows2)
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    # recovered run continues the SAME fold: replay the reference fold
    # over the full dense series (grid anchored at the first EMITTED
    # hour, sidestepping naive-datetime timezone interpretation) and
    # compare every emitted hour
    base_ms = min(h for _t, h in got)
    _, ref_rows = fold_series(
        (0, 0, 0, 0),
        [(base_ms + h * HOUR_MS, 1) for h in range(REF_HOURS + 8)],
    )
    want = {
        ("evt", r[0]): (r[1], r[2], r[3], r[4]) for r in ref_rows
    }
    for k, v in got.items():
        assert want[k] == v, k
    assert len(got) > n_before  # restart made further progress
