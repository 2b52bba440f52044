"""Streaming k-anonymity gate (streaming/k_anon_gate.py): classes
release their full backlog only after crossing k rows AND l distinct
users; never-qualifying classes ship nothing; the held-row cap
suppresses a hoarding class's oldest rows; restart on the same
checkpoint neither duplicates nor loses releases (stream ≡ batch
filter over the union of chunks).
"""

from __future__ import annotations

import datetime as dt
import os
from collections import defaultdict

from conftest import write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.k_anon_gate import (
    streaming_k_anon_gate,
)

T0 = dt.datetime(2024, 1, 1)
K, L = 5, 3


def _band(b: int) -> float:
    """A value inside hundred-band b."""
    return b * 100.0 + 7.5


def _rows():
    """band 0: 8 rows / 4 users -> releases. band 1: 6 rows / 2 users
    -> l fails, held forever. band 2: 3 rows / 3 users -> k fails.
    band 3: 10 rows / 5 users, users arriving late so the class
    crosses mid-stream and must flush its backlog."""
    rows, eid = [], 0

    def add(band, uid):
        nonlocal eid
        rows.append((uid, eid, _band(band), T0 + dt.timedelta(minutes=eid)))
        eid += 1

    for i in range(8):
        add(0, 400 + i % 4)
    for i in range(6):
        add(1, 500 + i % 2)
    for i in range(3):
        add(2, 600 + i)
    # band 3: first 6 rows all one user (cannot open), then diversity
    for i in range(6):
        add(3, 700)
    for i in range(4):
        add(3, 701 + i)
    return rows


def _batch_released(rows):
    per = defaultdict(lambda: (0, set()))
    for uid, eid, value, _ts in rows:
        band = int(value // 100)
        n, users = per[band]
        users.add(uid)
        per[band] = (n + 1, users)
    safe = {b for b, (n, users) in per.items() if n >= K and len(users) >= L}
    return {eid for uid, eid, value, _ts in rows if int(value // 100) in safe}


def _drain(spark, src, ckpt, sink, **kw):
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_k_anon_gate(stream, k=K, l_div=L, **kw)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(sink)
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_gate_matches_batch_filter(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    os.makedirs(src)
    rows = _rows()
    for i in range(3):
        write_events_chunk(spark, src, f"c{i}", rows[i::3])
    _drain(spark, src, ckpt, sink)
    got = spark.read.parquet(sink).collect()
    assert {r["event_id"] for r in got} == _batch_released(rows)
    # releases carry the right class and user
    by_eid = {eid: (uid, int(v // 100)) for uid, eid, v, _ in rows}
    for r in got:
        uid, band = by_eid[r["event_id"]]
        assert (r["user_id"], r["value_band"]) == (uid, band)
    # no duplicates
    assert len(got) == len({r["event_id"] for r in got})


def test_restart_exactly_once(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    os.makedirs(src)
    rows = _rows()
    write_events_chunk(spark, src, "c0", rows[0::3])
    write_events_chunk(spark, src, "c1", rows[1::3])
    _drain(spark, src, ckpt, sink)
    # band-3 diversity arrives only while the query is down
    write_events_chunk(spark, src, "c2", rows[2::3])
    _drain(spark, src, ckpt, sink)
    got = spark.read.parquet(sink).collect()
    assert {r["event_id"] for r in got} == _batch_released(rows)
    assert len(got) == len({r["event_id"] for r in got})  # no dupes


def test_held_cap_suppresses_oldest(spark, tmp_path):
    """One user spams 8 rows into a class with max_held=6, then two
    more users arrive and the class opens: only the 6 newest held rows
    release (eids 4..9) — the oldest 2 were suppressed at the cap,
    exactly like batch suppression of an unsafe class — and the
    released set itself satisfies k=5 rows / l=3 users."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    os.makedirs(src)
    rows = []
    for i in range(8):  # eids 0..7, single user
        rows.append((900, i, _band(0), T0 + dt.timedelta(minutes=i)))
    for i in range(2):  # eids 8..9 bring users 2 and 3 -> opens
        rows.append((901 + i, 8 + i, _band(0), T0 + dt.timedelta(minutes=8 + i)))
    write_events_chunk(spark, src, "c0", rows[:8])
    write_events_chunk(spark, src, "c1", rows[8:])
    _drain(spark, src, ckpt, sink, max_held=6)
    got = sorted(r["event_id"] for r in spark.read.parquet(sink).collect())
    assert got == [4, 5, 6, 7, 8, 9]


def test_max_held_below_k_rejected(spark):
    import pytest as _pytest

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.k_anon_gate import (
        streaming_k_anon_gate as gate,
    )

    with _pytest.raises(ValueError, match="max_held"):
        gate(spark.range(1).selectExpr("1 value", "1 event_id", "1 user_id"),
             k=5, max_held=4)


def test_event_time_ttl_suppresses_idle_backlog(spark, tmp_path):
    """band 1 holds 3 rows, then the watermark moves a day forward on
    band-0 traffic and band 1 goes idle past its TTL: its backlog is
    evicted. When band 1 later returns with rows that WOULD have
    completed the k/l thresholds against the old backlog, it starts
    from fresh state and still releases nothing — the evicted rows are
    suppressed for good, like a batch-suppressed class."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    os.makedirs(src)
    day = dt.timedelta(days=1)
    b1_old = [(500 + i, i, _band(1), T0 + dt.timedelta(minutes=i)) for i in range(3)]
    b0_a = [(400 + i % 4, 100 + i, _band(0), T0 + day) for i in range(8)]
    b0_b = [(400 + i % 4, 200 + i, _band(0), T0 + day + dt.timedelta(minutes=1)) for i in range(2)]
    b1_new = [(600 + i, 300 + i, _band(1), T0 + day) for i in range(2)]
    write_events_chunk(spark, src, "c0", b1_old)
    write_events_chunk(spark, src, "c1", b0_a)
    write_events_chunk(spark, src, "c2", b0_b)  # watermark now past TTL
    write_events_chunk(spark, src, "c3", b1_new)
    _drain_ttl(spark, src, ckpt, sink, ttl_ms=60_000, watermark="0 seconds")
    got = spark.read.parquet(sink).collect()
    assert not [r for r in got if r["value_band"] == 1]
    assert {r["event_id"] for r in got} == {100 + i for i in range(8)} | {
        200,
        201,
    }


def _drain_ttl(spark, src, ckpt, sink, **kw):
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_k_anon_gate(stream, k=K, l_div=L, **kw)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(sink)
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        q.processAllAvailable()  # no-data batch processes the timeouts
    finally:
        q.stop()


def test_opened_class_survives_stale_timeout(spark, tmp_path):
    """An OPENED class must stay open across idle gaps. The class arms
    a timeout while still un-opened (c0), opens in c1 (no re-arm, but
    the c0 timeout is still pending), goes idle while other-band
    traffic advances the watermark past the stale timeout (c2 — the
    timeout fires on the opened class), then receives late rows that
    alone could never satisfy k/l (c3). Those rows must pass straight
    through: dropping the flag at timeout would re-hold (and suppress)
    them, making the released set depend on arrival timing."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    os.makedirs(src)
    m = lambda mins: T0 + dt.timedelta(minutes=mins)
    c0 = [(400 + i % 2, i, _band(0), m(i)) for i in range(4)]
    c1 = [(402 + i % 2, 4 + i, _band(0), m(10 + i)) for i in range(4)]
    c2 = [(600, 100, _band(2), m(20))]  # advances wm past the stale arm
    c3 = [(404, 8, _band(0), m(30)), (404, 9, _band(0), m(31))]
    for name, chunk in [("c0", c0), ("c1", c1), ("c2", c2), ("c3", c3)]:
        write_events_chunk(spark, src, name, chunk)
    _drain_ttl(spark, src, ckpt, sink, ttl_ms=60_000, watermark="0 seconds")
    got = spark.read.parquet(sink).collect()
    assert {r["event_id"] for r in got} == set(range(10))
    assert len(got) == 10  # no duplicates either
