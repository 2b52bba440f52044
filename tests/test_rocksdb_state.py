"""RocksDB state store backend (SURVEY.md §2.9): the same stateful
operator runs under RocksDBStateStoreProvider — the production backend
for state larger than executor heap — and matches the default
HDFS-backed provider's answer. (The Spark 4 transformWithState API
stays protobuf-gated in stateful_tws.py; the state BACKEND itself
ships inside Spark and is covered here.)
"""

from __future__ import annotations

import datetime as dt
import os

from conftest import events_chunk_schema, write_events_chunk

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.stateful import (
    streaming_rising_edges,
)

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

T0 = dt.datetime(2024, 1, 1)


def _run(spark, src, qname):
    stream = (
        spark.readStream.schema(events_chunk_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_rising_edges(stream, threshold=150.0)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    try:
        return {
            (r.user_id, r.event_id): r.episode
            for r in spark.sql(f"select * from {qname}").collect()
        }
    finally:
        q.stop()


def test_rocksdb_state_store_matches_default(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # two chunks so per-key state genuinely crosses micro-batches
    write_events_chunk(
        spark, src, "f1",
        [(1, 1, 200.0, T0), (1, 2, 100.0, T0), (2, 3, 500.0, T0)],
    )
    write_events_chunk(
        spark, src, "f2",
        [(1, 4, 300.0, T0), (2, 5, 100.0, T0), (2, 6, 400.0, T0)],
    )
    default = _run(spark, src, "hdfs_state_out")
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        rocks = _run(spark, src, "rocksdb_state_out")
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)
    assert rocks == default
    assert rocks == {(1, 1): 1, (2, 3): 1, (1, 4): 2, (2, 6): 2}
