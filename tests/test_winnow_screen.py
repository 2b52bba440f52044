"""Streaming winnowing screen (streaming/winnow_screen.py): the
Python per-doc selection kernel is pinned bit-equal to the batch
Column pipeline on real documents; the stream-static evidence join is
stream ≡ batch; the Schleimer match guarantee carries to the screen
(a crafted arriving doc sharing an 11-char span with the corpus emits
evidence); exactly-once restart (stateless, so resume must neither
lose nor duplicate)."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.dedup import (
    _winnow_selected,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.winnow_screen import (
    build_fingerprint_index,
    streaming_winnow_screen,
    winnow_positions,
)

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_python_kernel_matches_batch_column_pipeline(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    got = {}
    for r in _winnow_selected(docs).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp_hash"]))
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(texts) > 10
    for doc_id, text in texts.items():
        want = set(winnow_positions(text))
        assert got.get(doc_id, set()) == want, doc_id


def _write_chunk(spark, src, name, rows):
    import glob as _glob
    import shutil as _shutil

    tmp = f"{src}/_{name}"
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(_glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet")
    _shutil.rmtree(tmp)


def _drain(spark, src, ckpt, out, index):
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_winnow_screen(stream, index)
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


def _batch_reference(spark, arriving, index):
    """The batch equivalent of the screen: winnow the arriving docs
    with the COLUMN pipeline, inner-join the index."""
    fps = _winnow_selected(arriving.select("doc_id", "text"))
    ref = fps.join(
        index.withColumnRenamed("df", "corpus_df"), "fp_hash"
    ).select("doc_id", "pos", "fp_hash", "corpus_df")
    return {
        (r["doc_id"], r["pos"], r["fp_hash"], r["corpus_df"])
        for r in ref.collect()
    }


def _split(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    corpus = docs.filter("doc_id % 3 != 0")
    arriving = docs.filter("doc_id % 3 = 0")
    return corpus, arriving


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    corpus, arriving = _split(spark, sf_dir)
    index = build_fingerprint_index(corpus)
    index.cache()
    rows = sorted(
        (r["doc_id"], r["text"]) for r in arriving.collect()
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(3):
        _write_chunk(spark, src, f"c{i}", rows[i::3])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, src, ckpt, out, index)
    got = {
        (r["doc_id"], r["pos"], r["fp_hash"], r["corpus_df"])
        for r in spark.read.parquet(out).collect()
    }
    want = _batch_reference(spark, arriving, index)
    assert got == want
    assert want, "split must actually produce shared fingerprints"


def test_restart_is_exactly_once(spark, sf_dir, tmp_path):
    corpus, arriving = _split(spark, sf_dir)
    index = build_fingerprint_index(corpus)
    index.cache()
    rows = sorted((r["doc_id"], r["text"]) for r in arriving.collect())
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_chunk(spark, src, "c0", rows[: len(rows) // 2])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, src, ckpt, out, index)
    _write_chunk(spark, src, "c1", rows[len(rows) // 2 :])
    _drain(spark, src, ckpt, out, index)
    got_rows = [
        (r["doc_id"], r["pos"], r["fp_hash"], r["corpus_df"])
        for r in spark.read.parquet(out).collect()
    ]
    assert len(got_rows) == len(set(got_rows)), "duplicated evidence"
    assert set(got_rows) == _batch_reference(spark, arriving, index)


def test_match_guarantee_carries_to_screen(spark, tmp_path):
    shared = "qwertzuiopa"  # 11 chars = K + W - 1
    corpus = spark.createDataFrame(
        [(1, "xxxxxxx" + shared + "yyyyyyyyy")], _DOC_SCHEMA
    )
    index = build_fingerprint_index(corpus)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_chunk(
        spark, src, "c0",
        [(2, "mmmmmmmmmmmmmm" + shared + "nn"), (3, "ABCDEFGHIJKLMNOP")],
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, src, ckpt, out, index)
    got = spark.read.parquet(out).collect()
    assert any(r["doc_id"] == 2 for r in got), "shared span must surface"
    assert all(r["doc_id"] != 3 for r in got), "disjoint doc must not"


def test_kernel_edge_cases():
    # below the noise threshold: no grams
    assert winnow_positions("abc") == []
    # single gram: one window, one pick
    assert len(winnow_positions("abcdefgh")) == 1
    # uniform text: rightmost tie-break selects every full-window end
    sel = winnow_positions("a" * 20)
    n_grams = 20 - 8 + 1
    assert [p for p, _ in sel] == list(range(4, n_grams + 1))
