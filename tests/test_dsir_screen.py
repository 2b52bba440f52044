"""Streaming DSIR admission screen (streaming/dsir_screen.py):
stream ≡ batch weight parity, restart exactly-once, threshold gate."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.data_selection import (
    dsir_q_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.dsir_screen import (
    dsir_weight_col,
    streaming_dsir_screen,
)

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch_weights(spark, docs, q_table):
    """The batch ranking's weight path (explode + join + groupBy sum)
    — plans/data_selection.py::dsir_select minus the top-k."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.functions.text import (
        tokens,
    )
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.data_selection import (
        _token_bucket,
    )

    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    ).select("doc_id", _token_bucket(F.col("token")))
    return {
        r.doc_id: r.w
        for r in tok.join(F.broadcast(q_table), "h")
        .groupBy("doc_id")
        .agg(F.sum("q").alias("w"))
        .collect()
    }


def test_fold_weight_matches_batch_join_weight(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    q_table = dsir_q_table(docs)
    q_map = {int(r.h): int(r.q) for r in q_table.collect()}
    want = _batch_weights(spark, docs, q_table)
    got = {
        r.doc_id: r.w
        for r in docs.select(
            "doc_id", dsir_weight_col(F.col("text"), q_map).alias("w")
        ).collect()
    }
    assert got == want
    assert len(got) > 100


def _write_chunk(spark, src, name, rows):
    tmp = f"{src}/_{name}"
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet")
    shutil.rmtree(tmp)


def _drain(spark, src, ckpt, out, q_table, threshold):
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_dsir_screen(stream, q_table, threshold)
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


def test_stream_screen_with_restart(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    corpus = docs.filter("doc_id % 3 != 0")
    arriving = docs.filter("doc_id % 3 = 0").select("doc_id", "text")
    q_table = dsir_q_table(corpus)
    q_table.cache()
    want_w = _batch_weights(spark, arriving, q_table)

    rows = sorted((r.doc_id, r.text) for r in arriving.collect())
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_chunk(spark, src, "c0", rows[: len(rows) // 2])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, src, ckpt, out, q_table, threshold=0)
    _write_chunk(spark, src, "c1", rows[len(rows) // 2 :])
    _drain(spark, src, ckpt, out, q_table, threshold=0)

    got = spark.read.parquet(out).collect()
    assert len(got) == len(rows), "exactly one verdict per arriving doc"
    for r in got:
        assert r.weight_micro == want_w.get(r.doc_id, 0), r.doc_id
        assert r.admitted == (r.weight_micro >= 0)
    # the gate must actually split: both admitted and rejected docs
    assert any(r.admitted for r in got) and any(not r.admitted for r in got)
