"""Streaming seasonal anomaly gate (streaming/anomaly_gate.py):
prequential parity against a plain-Python reference driven by the
SHARED score_hour kernel — spike flagged, gap hour zero-filled and
flagged (baseline quarantine keeps the spike from masking it),
recovery unflagged — plus exactly-once resume across a mid-stream
restart."""

from __future__ import annotations

import datetime as dt
import os

from conftest import write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.anomaly_gate import (
    MIN_BASELINE,
    score_hour,
    streaming_seasonal_anomalies,
)

T0 = dt.datetime(2024, 1, 1, 9, 0, 0)  # all activity in the 09h cell

# per-day event counts for hour 09: warm-up, one spike, one outage
DAY_COUNTS = [5, 6, 5, 4, 6, 5, 25, 5, None, 5]  # None = no events at all
SENTINEL_DAY = 10  # one late event pushes the watermark past day 9


def _rows():
    rows, eid = [], 0
    for day, cnt in enumerate(DAY_COUNTS):
        for k in range(cnt or 0):
            ts = T0 + dt.timedelta(days=day, minutes=k)
            rows.append((7, eid, 1.0, ts))
            eid += 1
    rows.append(
        (7, eid, 1.0, T0 + dt.timedelta(days=SENTINEL_DAY))
    )
    return rows


def _reference():
    """Prequential fold over the finalized counts (day 8's gap is a
    zero; the sentinel hour never finalizes — watermark stops short)."""
    out, n, s, q = [], 0, 0, 0
    for day, cnt in enumerate(DAY_COUNTS):
        c = cnt or 0
        dev, thr, anom = score_hour(c, n, s, q)
        out.append((day, c, n, dev, thr, anom))
        if not anom:
            n, s, q = n + 1, s + c, q + c * c
    return out


def _drain(spark, src, ckpt, out):
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_seasonal_anomalies(stream)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out)
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _check(rows):
    want = _reference()
    got = sorted(rows, key=lambda r: r["hour_start_ms"])
    assert len(got) == len(want)
    day0_ms = int(T0.timestamp()) * 1000
    for r, (day, c, n, dev, thr, anom) in zip(got, want):
        assert r["hour_start_ms"] == day0_ms + day * 86_400_000
        assert r["hod"] == 9
        assert (
            r["cnt"],
            r["baseline_n"],
            r["dev"],
            r["thr"],
            r["is_anomaly"],
        ) == (c, n, dev, thr, anom)
    # the scenario exercises what it claims to
    flags = [r["is_anomaly"] for r in got]
    assert flags[6] and flags[8], "spike and outage must be flagged"
    assert sum(flags) == 2, "recovery hours must stay green"
    assert all(
        not f for f, r in zip(flags, got) if r["baseline_n"] < MIN_BASELINE
    )


def test_prequential_parity_with_gap_and_spike(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out = str(tmp_path / "emitted")
    os.makedirs(src)
    rows = _rows()
    # time-ordered chunks so the watermark only ever advances
    third = len(rows) // 3
    write_events_chunk(spark, src, "c0", rows[:third])
    write_events_chunk(spark, src, "c1", rows[third : 2 * third])
    write_events_chunk(spark, src, "c2", rows[2 * third :])
    _drain(spark, src, ckpt, out)
    _check(spark.read.parquet(out).collect())


def test_restart_resumes_baseline_exactly(spark, tmp_path):
    """Kill the query mid-history and restart on the same checkpoint:
    the baseline must resume from state (not re-warm from zero) and the
    emitted set must equal the single-run result with no duplicates."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out = str(tmp_path / "emitted")
    os.makedirs(src)
    rows = _rows()
    half = len(rows) // 2
    write_events_chunk(spark, src, "c0", rows[:half])
    _drain(spark, src, ckpt, out)
    write_events_chunk(spark, src, "c1", rows[half:])
    _drain(spark, src, ckpt, out)
    _check(spark.read.parquet(out).collect())
