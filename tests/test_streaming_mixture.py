"""Streaming source-mixture monitor (streaming/mixture_monitor.py):
the maintained bucket table must yield the batch twin's exact JSD
relation after every drain, a replayed upsert must be a no-op, the
bucket-level JSD must lower-bound the token-level batch operator
(data-processing inequality), and a skewed source must alert.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.text import (
    js_divergence_sources,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.mixture_monitor import (
    JSD_ALERT,
    batch_jsd_per_source,
    jsd_per_source,
    streaming_bucket_counts,
)

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write_chunk(spark, src, name, rows):
    import glob
    import shutil

    tmp = f"{src}/_{name}"
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet")
    shutil.rmtree(tmp)


def _drain(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_bucket_counts(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


CHUNK1 = [
    (1, "alpha beta gamma alpha", "en", "a", 22),
    (2, "alpha beta gamma delta", "en", "b", 22),
]
CHUNK2 = [
    (3, "epsilon zeta eta theta iota kappa", "en", "a", 33),
    (4, "alpha alpha alpha alpha", "en", "b", 22),
]


def test_stream_equals_batch_and_replay_noop(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(src)
    _write_chunk(spark, src, "c1", CHUNK1)
    _drain(spark, src, out, ckpt)
    _write_chunk(spark, src, "c2", CHUNK2)
    _drain(spark, src, out, ckpt)

    docs = spark.createDataFrame(CHUNK1 + CHUNK2, DOC_SCHEMA)
    got = {
        r["source"]: (r["n_tokens"], r["jsd_bucketed"], r["alert"])
        for r in jsd_per_source(spark, out).collect()
    }
    want = {
        r["source"]: (r["n_tokens"], r["jsd_bucketed"], r["alert"])
        for r in batch_jsd_per_source(docs).collect()
    }
    assert got == want and set(got) == {"a", "b"}

    # restart with the same checkpoint and no new files: a replayed
    # drain must leave the table byte-identical (idempotent upsert)
    before = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    _drain(spark, src, out, ckpt)
    after = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert after == before


def test_bucket_jsd_lower_bounds_token_jsd(spark, sf_dir):
    """Data-processing inequality on real data: coarsening tokens onto
    the bucket universe can only DESTROY distinguishing information,
    so the monitor's statistic never exceeds the batch operator's."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bucket = {
        r["source"]: r["jsd_bucketed"]
        for r in batch_jsd_per_source(docs).collect()
    }
    token = {
        r["source"]: r["jsd"]
        for r in js_divergence_sources(spark, SF).collect()
    }
    assert set(bucket) == set(token)
    for s in bucket:
        assert bucket[s] <= token[s] + 1e-6


def test_skewed_source_alerts(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(src)
    # source b shares nothing with a: JSD = ln 2 >> alert threshold
    _write_chunk(
        spark,
        src,
        "c1",
        [
            (1, "alpha beta gamma", "en", "a", 16),
            (2, "delta epsilon zeta", "en", "b", 18),
        ],
    )
    _drain(spark, src, out, ckpt)
    rows = {r["source"]: r for r in jsd_per_source(spark, out).collect()}
    for s in ("a", "b"):
        assert rows[s]["alert"]
        assert rows[s]["jsd_bucketed"] > JSD_ALERT
