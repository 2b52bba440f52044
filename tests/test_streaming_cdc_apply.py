"""Streaming CDC apply (streaming/cdc_apply.py): the maintained
snapshot must converge to the one-shot batch compaction for any
micro-batch partitioning of the changelog (stream ≡ batch parity with
cdc_upsert_compaction), survive checkpoint restarts exactly-once, and
enforce the version guard + tombstone rules on out-of-order arrivals.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
    cdc_upsert_compaction,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.cdc_apply import (
    apply_batch,
    init_state,
    read_state,
)

_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_chunk(spark, src, name, rows):
    import glob as _glob
    import shutil as _shutil

    tmp = f"{src}/_{name}"
    spark.createDataFrame(rows, _CHANGE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(
        _glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet"
    )
    _shutil.rmtree(tmp)


def _init(spark, sf_dir, out):
    base = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("bkey"), "c_acctbal"
    )
    init_state(base, out)


def _changelog_rows(spark, sf_dir):
    rows = [
        (r["user_id"], r["event_id"], r["event_type"], r["value"])
        for r in load_table(spark, "events", sf_dir)
        .select("user_id", "event_id", "event_type", "value")
        .collect()
    ]
    rows.sort(key=lambda r: r[1])  # ts-order proxy: event_id
    return rows


def _drain(spark, src, ckpt, out):
    stream = (
        spark.readStream.schema(_CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch(spark, out))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _as_map(df):
    return {
        r["custkey"]: (
            r["cur_value"],
            r["status"],
            r["n_changes"],
            r["last_version"],
        )
        for r in df.collect()
    }


def test_stream_converges_to_batch_compaction(spark, sf_dir, tmp_path):
    out, src = str(tmp_path / "state"), str(tmp_path / "src")
    os.makedirs(src)
    _init(spark, sf_dir, out)
    rows = _changelog_rows(spark, sf_dir)
    third = len(rows) // 3
    for i, lo in enumerate(range(0, len(rows), third)):
        _write_chunk(spark, src, f"c{i}", rows[lo : lo + third])
    _drain(spark, src, str(tmp_path / "ckpt"), out)
    assert _as_map(read_state(spark, out)) == _as_map(
        cdc_upsert_compaction(spark, sf_dir)
    )


def test_restart_applies_each_batch_exactly_once(
    spark, sf_dir, tmp_path
):
    out, src = str(tmp_path / "state"), str(tmp_path / "src")
    os.makedirs(src)
    _init(spark, sf_dir, out)
    rows = _changelog_rows(spark, sf_dir)
    half = len(rows) // 2
    ckpt = str(tmp_path / "ckpt")
    _write_chunk(spark, src, "c0", rows[:half])
    _drain(spark, src, ckpt, out)
    _write_chunk(spark, src, "c1", rows[half:])
    _drain(spark, src, ckpt, out)  # restart on the same checkpoint
    assert _as_map(read_state(spark, out)) == _as_map(
        cdc_upsert_compaction(spark, sf_dir)
    )


def test_version_guard_and_tombstones(spark, tmp_path):
    """Out-of-order arrivals: a LATER-arriving but OLDER-versioned
    change must lose — both against a newer upsert and against a
    tombstoned delete (which is exactly why deletes are retained)."""
    out = str(tmp_path / "state")
    base = spark.createDataFrame(
        [(1, 100.0), (2, 200.0)], "bkey long, c_acctbal double"
    )
    init_state(base, out)
    fn = apply_batch(spark, out)
    mk = lambda rows: spark.createDataFrame(rows, _CHANGE_SCHEMA)
    # batch 0: k1 upsert v50; k2 delete v60; k3 (new) upsert v10
    fn(mk([(1, 50, "click", 11.0), (2, 60, "error", 0.0),
           (3, 10, "view", 33.0)]), 0)
    # batch 1 arrives LATER but carries OLDER versions: all must lose
    fn(mk([(1, 40, "error", 0.0), (2, 55, "click", 22.0),
           (3, 5, "error", 0.0)]), 1)
    got = _as_map(read_state(spark, out))
    assert got[1] == (11.0, "updated", 2, 50)   # not deleted by v40
    assert 2 not in got                          # v55 upsert lost to v60
    assert got[3] == (33.0, "inserted", 2, 10)  # v5 delete lost to v10
    # replayed batch id is a no-op
    fn(mk([(1, 99, "click", 99.0)]), 1)
    assert _as_map(read_state(spark, out)) == got
    # a genuinely newer delete wins and tombstones the row
    fn(mk([(1, 70, "error", 0.0)]), 2)
    got2 = _as_map(read_state(spark, out))
    assert 1 not in got2
    # ...and a newer upsert resurrects it
    fn(mk([(1, 80, "signup", 44.0)]), 3)
    assert _as_map(read_state(spark, out))[1] == (
        44.0, "updated", 4, 80,
    )


def test_random_partitionings_converge(spark, tmp_path):
    """Seeded randomized convergence: for several random changelogs
    (unique versions — the documented precondition), ANY partitioning
    into micro-batches in ANY batch order must land on the one-shot
    batch compaction. This is the property the version guard +
    tombstones exist for; a regression in either shows up as a
    divergent snapshot on some shuffle."""
    import random

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
        compact_changelog,
    )

    rng = random.Random(20260815)
    types = ["click", "view", "signup", "purchase", "error"]
    for case in range(4):
        keys = list(range(1, 9))
        base_rows = [(k, float(100 * k)) for k in keys[:5]]
        n = 24
        versions = rng.sample(range(1000), n)
        rows = [
            (
                rng.choice(keys),
                versions[i],
                rng.choice(types),
                round(rng.uniform(1, 99), 2),
            )
            for i in range(n)
        ]
        base = spark.createDataFrame(
            base_rows, "bkey long, c_acctbal double"
        )
        want = _as_map(
            compact_changelog(
                base,
                spark.createDataFrame(rows, _CHANGE_SCHEMA).select(
                    F.col("user_id").alias("ckey"),
                    "event_id",
                    "event_type",
                    "value",
                ),
            )
        )
        out = str(tmp_path / f"state{case}")
        init_state(base, out)
        fn = apply_batch(spark, out)
        shuffled = rows[:]
        rng.shuffle(shuffled)
        n_batches = rng.randint(2, 5)
        for bid in range(n_batches):
            chunk = shuffled[bid::n_batches]
            fn(spark.createDataFrame(chunk, _CHANGE_SCHEMA), bid)
        assert _as_map(read_state(spark, out)) == want, case
