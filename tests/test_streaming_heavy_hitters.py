"""Streaming heavy hitters (streaming/heavy_hitters.py): bounded-state
Space-Saving over chunked micro-batch replay. With capacity covering
the per-cell key set the summary must be EXACT and the snapshot equal
to the batch groupBy-count top-k; with a squeezed capacity the
Space-Saving invariants (over-estimate bounded by err; true heavy
hitters present) must hold against exact Python counts."""

from __future__ import annotations

import datetime as dt
import os
from collections import Counter

from conftest import write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.heavy_hitters import (
    heavy_hitters_snapshot,
    streaming_heavy_hitters,
)

T0 = dt.datetime(2024, 1, 1)


def _rows():
    """Skewed key distribution: user 7 is the runaway hot key, a few
    warm keys, a tail of singletons — spread over 3 chunks so summaries
    must merge across micro-batches."""
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731
    rows = []
    eid = 0
    spec = [(7, 30), (3, 12), (11, 9), (19, 5), (2, 3)] + [
        (100 + i, 1) for i in range(20)
    ]
    for uid, n in spec:
        for _ in range(n):
            rows.append((uid, eid, 1.0, t(eid % 60)))
            eid += 1
    # deterministic interleave so chunks mix hot and cold keys
    rows.sort(key=lambda r: (r[1] * 2654435761) % 1000003)
    return rows


def _drain(spark, src, ckpt, name, capacity, n_cells):
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_heavy_hitters(stream, capacity=capacity, n_cells=n_cells)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_exact_when_capacity_covers_keys(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = _rows()
    for i in range(3):
        write_events_chunk(spark, src, f"c{i}", rows[i::3])
    emitted = _drain(spark, src, ckpt, "hh_exact", capacity=64, n_cells=4)
    true = Counter(r[0] for r in rows)
    snap = heavy_hitters_snapshot(emitted, top=5).collect()
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["user_id"], r["est"]) for r in snap] == want
    assert all(r["err"] == 0 for r in snap)
    assert [r["rank"] for r in snap] == [1, 2, 3, 4, 5]


def test_invariants_under_squeezed_capacity(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = _rows()
    for i in range(3):
        write_events_chunk(spark, src, f"c{i}", rows[i::3])
    n_cells, capacity = 2, 3
    emitted = _drain(
        spark, src, ckpt, "hh_tight", capacity=capacity, n_cells=n_cells
    )
    true = Counter(r[0] for r in rows)
    cell_rows = Counter(r[0] % n_cells for r in rows)
    # latest summaries only
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    latest = (
        emitted.withColumn(
            "_v", F.max("version").over(Window.partitionBy("cell"))
        )
        .filter(F.col("version") == F.col("_v"))
        .collect()
    )
    per_cell = Counter(r["cell"] for r in latest)
    assert all(n <= capacity for n in per_cell.values())  # bounded state
    for r in latest:
        t = true[r["user_id"]]
        assert t <= r["est"], r  # never under-estimates
        assert r["est"] - r["err"] <= t, r  # err bounds the inflation
    # every key heavier than its cell's worst-case min counter is kept
    present = {r["user_id"] for r in latest}
    for uid, t in true.items():
        if t > cell_rows[uid % n_cells] / capacity:
            assert uid in present, (uid, t)
    # the runaway hot key tops the snapshot despite the tiny summary
    snap = heavy_hitters_snapshot(emitted, top=1).collect()
    assert snap[0]["user_id"] == 7


def test_restart_resumes_summaries_exactly(spark, tmp_path):
    """Kill the query between chunks and restart on the same
    checkpoint (durable foreachBatch sink — the memory sink cannot
    recover): cell summaries must resume from state (not recount from
    zero), and the final snapshot must equal the all-data batch
    top-k."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    out = str(tmp_path / "emitted")
    os.makedirs(src)

    def drain_durable(name):
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_heavy_hitters(stream, capacity=64, n_cells=4)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    rows = _rows()
    write_events_chunk(spark, src, "c0", rows[0::3])
    write_events_chunk(spark, src, "c1", rows[1::3])
    drain_durable("a")
    # new data arrives while the query is down
    write_events_chunk(spark, src, "c2", rows[2::3])
    drain_durable("b")
    true = Counter(r[0] for r in rows)
    snap = heavy_hitters_snapshot(spark.read.parquet(out), top=5).collect()
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["user_id"], r["est"]) for r in snap] == want
    assert all(r["err"] == 0 for r in snap)


def test_windowed_heavy_hitters_finalize_on_watermark(spark, tmp_path):
    """Per-hour summaries finalize exactly once when the watermark
    clears the hour, match exact per-hour counts (capacity covers the
    key sets), and the still-open hour emits nothing."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.heavy_hitters import (
        HOUR_MS,
        streaming_windowed_heavy_hitters,
    )

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    t = lambda h, m: T0 + dt.timedelta(hours=h, minutes=m)  # noqa: E731
    eid = 0
    per_hour_rows = {0: [], 1: [], 2: []}
    for hour in range(3):
        spec = [(7, 10 + hour), (3, 4), (50 + hour, 2), (90 + hour, 1)]
        minute = 0
        for uid, n in spec:
            for _ in range(n):
                per_hour_rows[hour].append(
                    (uid, eid, 1.0, t(hour, minute % 60))
                )
                eid += 1
                minute += 3
    # time-ordered chunks so the advancing watermark never drops rows;
    # the hour-5 sentinel pushes the watermark past hour 3's end
    for hour in range(3):
        write_events_chunk(spark, src, f"c{hour}", per_hour_rows[hour])
    write_events_chunk(spark, src, "c_sentinel", [(999, eid, 1.0, t(5, 20))])

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_windowed_heavy_hitters(stream, capacity=64, n_cells=2)
        .writeStream.format("memory")
        .queryName("hh_windowed")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM hh_windowed").collect()
    finally:
        q.stop()

    base_ms = int(T0.timestamp() * 1000)
    finalized = {
        (r["hour_start_ms"], r["user_id"]): (r["est"], r["err"]) for r in got
    }
    assert len(finalized) == len(got), "a window finalized twice"
    want = {}
    for hour, rows in per_hour_rows.items():
        for uid, n in Counter(r[0] for r in rows).items():
            want[(base_ms + hour * HOUR_MS, uid)] = (n, 0)
    assert finalized == want  # exact, and the open hour-5 cell absent


def test_space_saving_eviction_tiebreak_deterministic():
    """Equal-count evictions must resolve by smallest user_id, not dict
    insertion order (ADVICE r5): two summaries holding the same
    counters in different insertion orders must evict the same user."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.heavy_hitters import (
        _space_saving_merge,
    )

    a = {7: (3, 0), 2: (3, 0), 9: (3, 0)}
    b = {9: (3, 0), 7: (3, 0), 2: (3, 0)}
    _space_saving_merge(a, {100: 1}, capacity=3)
    _space_saving_merge(b, {100: 1}, capacity=3)
    assert a == b
    assert 2 not in a and a[100] == (4, 3)
