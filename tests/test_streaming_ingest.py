"""Streaming corpus ingest (streaming/ingest.py): the appended table
must equal the batch expectation (gate + first-per-fingerprint +
corpus anti-join), survive a restart without duplicating accepted
docs (file-sink manifest), and reject corpus-known fingerprints."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.ingest import (
    batch_ingest_expectation,
    build_corpus_index,
    compact_corpus_index,
    streaming_corpus_ingest,
)

T0 = dt.datetime(2024, 3, 1)

SCHEMA = "doc_id long, ts timestamp, text string, source string"

GOOD = "spark table join window filter aggregate shuffle partition " * 6
DUP = "merge sort hash scan batch stream value column row key " * 6
LOW = "a b"  # fails the length gate


def _write_chunk(spark, src, name, rows):
    tmp = f"{src}/_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet")
    shutil.rmtree(tmp)


def _drain(spark, src, index_dir, out, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_corpus_ingest(spark, stream, index_dir, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_ingest_matches_batch_and_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731

    # corpus already contains DUP's fingerprint
    corpus = spark.createDataFrame(
        [(900, t(-999), DUP, "old")], SCHEMA
    )
    build_corpus_index(corpus, index_dir)

    _write_chunk(
        spark,
        src,
        "c1",
        [
            (1, t(0), GOOD, "s1"),  # accepted
            (2, t(1), LOW, "s1"),  # gated out
            (3, t(2), DUP, "s2"),  # corpus-known → rejected
        ],
    )
    _write_chunk(
        spark,
        src,
        "c2",
        [
            (4, t(3), GOOD, "s2"),  # in-stream dup of doc 1 → rejected
            (5, t(4), GOOD + "fresh tokens", "s3"),  # accepted
        ],
    )
    _drain(spark, src, index_dir, out, ckpt)

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 5}

    want = batch_ingest_expectation(
        spark.read.parquet(src), spark.read.parquet(index_dir)
    )
    wset = {
        (r["doc_id"], r["fp"], round(r["quality"], 6))
        for r in want.collect()
    }
    gset = {
        (r["doc_id"], r["fp"], round(r["quality"], 6))
        for r in spark.read.parquet(out).collect()
    }
    assert gset == wset

    # restart with one more chunk: manifest keeps prior files committed
    # exactly once; the new accepted doc appends
    _write_chunk(spark, src, "c3", [(6, t(5), GOOD + "more new words", "s1")])
    _drain(spark, src, index_dir, out, ckpt)
    got2 = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got2 == [1, 5, 6]

    # compaction closes the beyond-watermark gap: fold accepted fps
    # into the index between incarnations, then feed a duplicate of an
    # accepted doc arriving far outside the watermark — the adopted
    # index rejects it even though its state-store entry is long gone
    compact_corpus_index(spark, index_dir, out)
    _write_chunk(
        spark, src, "c4", [(7, t(60 * 24 * 7), GOOD, "late-dup")]
    )
    _drain(spark, src, index_dir, out, ckpt)
    got3 = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got3 == [1, 5, 6]


def test_out_of_order_arrival_fp_set_parity(spark, tmp_path):
    """Arrival order contradicts event time: the row-level min-(ts,
    doc_id) spec no longer describes the stream's kept representative,
    but the fingerprint-set spec (ingest_fp_expectation) must hold
    exactly — and the count of accepted rows must equal the count of
    accepted fingerprints (one representative each)."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.ingest import (
        ingest_fp_expectation,
    )

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731

    build_corpus_index(
        spark.createDataFrame([(900, t(-999), DUP, "old")], SCHEMA), index_dir
    )
    # doc 11 arrives FIRST but has the LATER event time; doc 10 (earlier
    # ts, same text) arrives second — the stream keeps 11, the row-level
    # batch spec would keep 10
    _write_chunk(spark, src, "c1", [(11, t(30), GOOD, "s1")])
    _write_chunk(
        spark, src, "c2",
        [(10, t(0), GOOD, "s1"), (12, t(1), GOOD + "new stuff", "s2")],
    )
    _drain(spark, src, index_dir, out, ckpt)

    got = spark.read.parquet(out).collect()
    assert sorted(r["doc_id"] for r in got) == [11, 12]  # first arrival kept
    want_fps = {
        r["fp"]
        for r in ingest_fp_expectation(
            spark.read.parquet(src), spark.read.parquet(index_dir)
        ).collect()
    }
    assert {r["fp"] for r in got} == want_fps
    assert len(got) == len(want_fps)


def test_compaction_crash_between_renames_heals(spark, tmp_path):
    """Simulate dying between the two renames (live index renamed to
    <index>.old, staging not yet moved in): the next compaction must
    restore the old index and complete normally."""
    import os as _os
    import shutil as _shutil

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.ingest import (
        restore_corpus_index,
    )

    index_dir = str(tmp_path / "index")
    out = str(tmp_path / "accepted")
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731
    build_corpus_index(
        spark.createDataFrame([(1, t(0), GOOD, "s1")], SCHEMA), index_dir
    )
    spark.createDataFrame(
        [(2, t(1), GOOD + "fresh", "s2")], SCHEMA
    ).select(F.sha2(F.col("text"), 256).alias("fp")).write.parquet(out)

    # crash simulation: live index renamed aside, nothing in its place
    _os.rename(index_dir, index_dir + ".old")
    assert not _os.path.exists(index_dir)
    assert restore_corpus_index(index_dir) is True
    assert _os.path.exists(index_dir)
    # and a full compaction on the healed state folds the accepted fp in
    compact_corpus_index(spark, index_dir, out)
    fps = {r["fp"] for r in spark.read.parquet(index_dir).collect()}
    assert len(fps) == 2
    assert not _os.path.exists(index_dir + ".old")
    _shutil.rmtree(out)


def test_compaction_reclaims_orphaned_staging_dirs(spark, tmp_path):
    """Repeated mid-swap crashes leave completed fpindex_staging_*
    siblings behind; the next compaction must reclaim them instead of
    accumulating full-index copies forever (ADVICE r5)."""
    import os as _os

    index_dir = str(tmp_path / "index")
    out = str(tmp_path / "accepted")
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731
    build_corpus_index(
        spark.createDataFrame([(1, t(0), GOOD, "s1")], SCHEMA), index_dir
    )
    spark.createDataFrame(
        [(2, t(1), GOOD + "fresh", "s2")], SCHEMA
    ).select(F.sha2(F.col("text"), 256).alias("fp")).write.parquet(out)

    # two orphaned staging copies from prior crashed compactions
    for i in range(2):
        orphan = str(tmp_path / f"fpindex_staging_orphan{i}")
        _os.makedirs(orphan)
        with open(_os.path.join(orphan, "part-0.parquet"), "wb") as f:
            f.write(b"junk")

    compact_corpus_index(spark, index_dir, out)
    leftovers = [
        e for e in _os.listdir(tmp_path) if e.startswith("fpindex_staging_")
    ]
    assert leftovers == []
    fps = {r["fp"] for r in spark.read.parquet(index_dir).collect()}
    assert len(fps) == 2
