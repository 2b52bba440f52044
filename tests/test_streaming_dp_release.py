"""Streaming DP release gate (streaming/dp_release.py): released set
parity against a plain-Python ledger fold sharing the operator's noise
kernel — per-class hourly releases in watermark order, integer-µε
budget accounting, published suppression rows after exhaustion — plus
exactly-once resume of the ledger across a mid-stream restart, and
mechanism parity between the Python kernel and the batch
dp_noisy_counts Column expression."""

from __future__ import annotations

import datetime as dt
import os

from conftest import write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.dp_release import (
    laplace_pseudo_noise,
    release_key,
    streaming_dp_release,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)
HOUR_MS = 3_600_000
BUDGET = 3.0    # three ε=1 releases per class, then suppression
EPSILON = 1.0

# per-hour event counts for two value bands (50.0 → band 0, 150.0 → band 1):
# band 0 has data in 5 hours (hours 3+ must suppress); band 1 in 2 hours
# (never exhausts); hour 2 is empty for band 1 — no row, no spend
BAND_HOURS = {
    0: {0: 3, 1: 1, 2: 2, 3: 4, 5: 1},
    1: {0: 2, 3: 5},
}
BAND_VALUE = {0: 50.0, 1: 150.0}
SENTINEL_HOUR = 9  # late event closes the watermark past hour 8


def _rows():
    rows, eid = [], 0
    for band, hours in sorted(BAND_HOURS.items()):
        for h, cnt in sorted(hours.items()):
            for k in range(cnt):
                ts = T0 + dt.timedelta(hours=h, minutes=k)
                rows.append((100 + band, eid, BAND_VALUE[band], ts))
                eid += 1
    rows.append((999, eid, 50.0, T0 + dt.timedelta(hours=SENTINEL_HOUR)))
    return sorted(rows, key=lambda r: r[3])


def _reference():
    """Ledger fold over finalized hours in ascending order per band.
    The sentinel event lands in band 0 hour 9, which never finalizes
    (the watermark stops short of its own hour)."""
    day0_ms = int(T0.timestamp()) * 1000
    out = []
    for band, hours in sorted(BAND_HOURS.items()):
        spent = 0
        for h, cnt in sorted(hours.items()):
            hms = day0_ms + h * HOUR_MS
            if spent + 1_000_000 <= int(BUDGET * 1_000_000):
                spent += 1_000_000
                noisy = round(
                    cnt + laplace_pseudo_noise(release_key(band, hms), EPSILON),
                    6,
                )
                out.append(
                    (band, hms, True, "laplace_pseudo", EPSILON,
                     spent / 1e6, noisy)
                )
            else:
                out.append(
                    (band, hms, False, "suppressed_budget", 0.0,
                     spent / 1e6, None)
                )
    return sorted(out)


def _drain(spark, src, ckpt, out):
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_dp_release(stream, budget_eps=BUDGET, epsilon=EPSILON)
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
    got = sorted(
        (
            r["value_band"],
            r["hour_start_ms"],
            r["released"],
            r["mechanism"],
            r["epsilon"],
            r["eps_spent"],
            r["noisy_count"],
        )
        for r in rows
    )
    want = _reference()
    assert got == want
    # the scenario exercises what it claims to: both paths appear and
    # the suppressed rows are exactly band 0's 4th and 5th data-hours
    suppressed = [(b, h) for b, h, rel, *_ in got if not rel]
    day0_ms = int(T0.timestamp()) * 1000
    assert suppressed == [
        (0, day0_ms + 3 * HOUR_MS),
        (0, day0_ms + 5 * HOUR_MS),
    ]
    assert all(n is None for b, h, rel, m, e, s, n in got if not rel)
    assert max(s for b, h, rel, m, e, s, n in got) == BUDGET


def test_release_parity_and_budget(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out = str(tmp_path / "emitted")
    os.makedirs(src)
    rows = _rows()
    third = len(rows) // 3
    write_events_chunk(spark, src, "c0", rows[:third])
    write_events_chunk(spark, src, "c1", rows[third : 2 * third])
    write_events_chunk(spark, src, "c2", rows[2 * third :])
    _drain(spark, src, ckpt, out)
    _check(spark.read.parquet(out).collect())


def test_restart_resumes_ledger_exactly(spark, tmp_path):
    """Kill mid-history and restart on the same checkpoint: the µε
    ledger must resume from state (a re-warmed ledger would release
    band 0's later hours instead of suppressing them) and the emitted
    set must equal the single-run result with no duplicates."""
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


def test_mechanism_parity_with_batch_release(spark):
    """The gate's Python noise kernel and the batch dp_noisy_counts
    Column expression are the SAME mechanism: recompute every batch
    noisy_count from the published (event_type, day) key with the
    shared kernel."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pipeline_quality import (
        dp_noisy_counts,
    )

    rows = dp_noisy_counts(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        want = round(
            r["n_events"]
            + laplace_pseudo_noise(
                f"{r['event_type']}|{r['day']}", r["epsilon"]
            ),
            6,
        )
        assert r["noisy_count"] == want, (r["event_type"], r["day"])


def test_parameter_validation(spark, tmp_path):
    import pytest as _pytest

    src = str(tmp_path / "src")
    os.makedirs(src)
    write_events_chunk(spark, src, "c0", _rows()[:4])
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    with _pytest.raises(ValueError):
        streaming_dp_release(stream, epsilon=0.0)
    with _pytest.raises(ValueError):
        streaming_dp_release(stream, budget_eps=-1.0)
