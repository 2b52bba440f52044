"""Streaming quantile sketch (streaming/quantile_sketch.py): the
deterministic KLL-style compactor over chunked micro-batch replay —
weight conservation, bounded per-level state, rank-error band vs exact
percentiles, checkpoint restart without loss/double-ingest, and the
cell-merge snapshot path."""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
from conftest import write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.quantile_sketch import (
    K,
    kll_quantile,
    kll_update,
    kll_weighted_items,
    quantile_snapshot,
    streaming_quantile_sketch,
)

T0 = dt.datetime(2024, 1, 1)


# --- sketch unit properties ---------------------------------------------------


def test_weight_conservation_and_bounded_levels():
    rng = np.random.RandomState(1)
    data = rng.permutation(50_000).astype(float)
    levels = []
    for chunk in np.array_split(data, 23):
        levels = kll_update(levels, chunk)
    _items, weights = kll_weighted_items(levels)
    assert int(weights.sum()) == len(data)  # exact mass conservation
    assert all(len(lv) <= K for lv in levels)  # bounded state
    assert len(levels) <= int(np.log2(len(data))) + 2


def test_rank_error_band_random_and_sorted():
    n = 100_000
    for order in ("random", "sorted", "reversed"):
        if order == "random":
            data = np.random.RandomState(2).permutation(n).astype(float)
        elif order == "sorted":
            data = np.arange(n, dtype=float)
        else:
            data = np.arange(n, dtype=float)[::-1]
        levels = []
        for chunk in np.array_split(data, 31):
            levels = kll_update(levels, chunk)
        for q in (0.1, 0.5, 0.9):
            est = kll_quantile(levels, q)
            assert abs(est - q * n) / n <= 0.05, (order, q, est)


def test_deterministic_same_input_same_sketch():
    data = np.random.RandomState(3).permutation(10_000).astype(float)
    runs = []
    for _ in range(2):
        levels = []
        for chunk in np.array_split(data, 11):
            levels = kll_update(levels, chunk)
        runs.append([lv.tolist() for lv in levels])
    assert runs[0] == runs[1]


# --- streaming path -----------------------------------------------------------


def _rows(n=3000):
    """Values 0..n-1 in a deterministic shuffle, so exact percentiles
    are known in closed form."""
    t = lambda m: T0 + dt.timedelta(seconds=m)  # noqa: E731
    order = np.argsort((np.arange(n) * 2654435761) % 1000003)
    return [(int(i % 50), int(i), float(order[i]), t(i % 3600)) for i in range(n)]


def _drain(spark, src, ckpt, name, n_cells=4):
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_quantile_sketch(stream, n_cells=n_cells)
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


def test_stream_quantiles_match_exact_within_band(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = _rows()
    for i in range(3):
        write_events_chunk(spark, src, f"c{i}", rows[i::3])
    emitted = _drain(spark, src, ckpt, "qs_stream")
    n = len(rows)
    snap = quantile_snapshot(emitted, qs=(0.1, 0.5, 0.9))
    for q, est in snap.items():
        assert abs(est - q * n) / n <= 0.08, (q, est)
    # total mass across newest-version cells equals the row count
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    latest = F.max("version").over(Window.partitionBy("cell"))
    mass = (
        emitted.withColumn("_l", latest)
        .filter(F.col("version") == F.col("_l"))
        .select(F.pow(F.lit(2.0), F.col("level")).alias("wt"))
        .agg(F.sum("wt"))
        .first()[0]
    )
    assert int(mass) == n


def test_checkpoint_restart_no_double_ingest(spark, tmp_path):
    """Restart between chunks: the sketch's total mass must equal the
    row count exactly — re-ingested batches would inflate it."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = _rows(1200)
    got: list[tuple] = []  # (cell, version, level, item) accumulated

    def sink(df, _bid):
        got.extend(
            (r.cell, r.version, r.level, r.item) for r in df.collect()
        )

    def run_once():
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_quantile_sketch(stream, n_cells=4)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_events_chunk(spark, src, "c0", rows[:600])
    run_once()
    write_events_chunk(spark, src, "c1", rows[600:])
    run_once()

    # newest version per cell; mass must equal the row count exactly —
    # a re-ingested batch after restart would inflate it
    latest: dict[int, int] = {}
    for cell, version, _lvl, _item in got:
        latest[cell] = max(latest.get(cell, 0), version)
    mass = sum(
        1 << lvl
        for cell, version, lvl, _item in got
        if version == latest[cell]
    )
    assert mass == len(rows)

    import pandas as pd

    both = spark.createDataFrame(
        pd.DataFrame(got, columns=["cell", "version", "level", "item"])
    )
    snap = quantile_snapshot(both, qs=(0.5,))
    assert abs(snap[0.5] - 0.5 * len(rows)) / len(rows) <= 0.08
