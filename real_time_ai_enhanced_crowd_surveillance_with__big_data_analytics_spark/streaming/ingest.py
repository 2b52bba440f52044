"""Streaming corpus ingest: the end-to-end acquisition pipeline an
LLM data operation runs continuously, composed from this engine's
existing parts — quality gate (codegen column math) → in-stream exact
dedup (fingerprint state) → anti-join against the persisted corpus
fingerprint index → exactly-once parquet append.

Delivery: the parquet file sink is exactly-once BY CONSTRUCTION in
Structured Streaming (the _spark_metadata manifest commits files per
epoch; replayed batches re-register the same files, readers only see
manifested ones) — no foreachBatch ledger needed on this path.

State: in-stream dedup uses dropDuplicatesWithinWatermark keyed on
the fingerprint, so the state store holds only the watermark horizon,
not all history — history is the PERSISTED corpus index (the
stream-static anti-join side, the same only-digests-move argument as
plans/dedup.py::dedup_incremental). The division of labour is the
standard lambda tradeoff, stated precisely:

- a duplicate arriving WITHIN the watermark of its first copy is
  caught by the state store;
- a duplicate arriving AFTER the first copy entered the index (via
  ``compact_corpus_index``) is caught by the anti-join;
- the gap — older than the watermark but newer than the last
  compaction — is bounded by the compaction cadence.

The index is adopted at STREAM START: Spark pins the static side's
file listing when the query starts, so compaction writes a fresh
index and the stream restarts to adopt it (blue/green). Compacting
into a live query's index directory would delete files the running
plan references — never do that. At 100 TB the index lives
fingerprint-bucketed so each batch's anti-join prunes to matching
buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.text import quality_score

QUALITY_GATE = 0.5


def build_corpus_index(docs: DataFrame, index_dir: str) -> None:
    """Persist the corpus fingerprint index (DISTINCT sha256) — the
    batch bootstrap; the stream keeps new fingerprints out of the
    corpus, a periodic compaction folds accepted docs back in."""
    (
        docs.select(F.sha2(F.col("text"), 256).alias("fp"))
        .distinct()
        .write.mode("overwrite")
        .parquet(index_dir)
    )


def compact_corpus_index(
    spark: SparkSession, index_dir: str, accepted_dir: str
) -> None:
    """Fold the fingerprints of accepted (ingested) docs back into the
    corpus index — the periodic compaction that closes the
    beyond-watermark dedup gap. Must run between stream incarnations
    (the running query pins the old index's file listing); the restart
    adopts the compacted index.

    Swap ordering is write-new / rename-old-aside / rename-new /
    delete-old: the staging dir is a SIBLING of ``index_dir`` (same
    filesystem, so both renames are atomic directory moves, never a
    recursive cross-device copy), and the live index is renamed aside
    to the deterministic ``<index>.old`` rather than deleted first —
    at every instant either the old or the new index exists under a
    KNOWN name. A crash between the two renames leaves only
    ``<index>.old``; the next call (or :func:`restore_corpus_index`)
    rolls it back before compacting, so recovery is automatic."""
    import os
    import shutil
    import tempfile

    local_index = os.path.abspath(index_dir.removeprefix("file:"))
    restore_corpus_index(local_index)  # heal a prior mid-swap crash
    # reclaim staging dirs orphaned by crashes AFTER the new index was
    # fully written but before/while it was being swapped in — the
    # rollback above restores the index, but repeated mid-swap crashes
    # would otherwise accumulate full-index copies forever (ADVICE r5)
    parent_dir = os.path.dirname(local_index)
    for entry in os.listdir(parent_dir):
        if entry.startswith("fpindex_staging_"):
            shutil.rmtree(os.path.join(parent_dir, entry), ignore_errors=True)
    old = spark.read.parquet(index_dir).select("fp")
    new = spark.read.parquet(accepted_dir).select("fp")
    # distributed union-distinct to a staging dir (Spark refuses to
    # overwrite a path it is reading), then the two-rename swap
    parent = os.path.dirname(local_index)
    staging = tempfile.mkdtemp(prefix="fpindex_staging_", dir=parent)
    retired = local_index + ".old"
    try:
        old.union(new).distinct().write.mode("overwrite").parquet(staging)
        if os.path.exists(retired):  # leftover from an interrupted delete
            shutil.rmtree(retired)
        os.rename(local_index, retired)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    os.rename(staging, local_index)
    shutil.rmtree(retired)


def restore_corpus_index(index_dir: str) -> bool:
    """Heal a compaction interrupted between its two renames: if the
    live index is missing but ``<index>.old`` exists, rename it back.
    Returns True if a restore happened. Idempotent and safe to call
    before any read of the index."""
    import os

    local_index = os.path.abspath(index_dir.removeprefix("file:"))
    retired = local_index + ".old"
    if not os.path.exists(local_index) and os.path.exists(retired):
        os.rename(retired, local_index)
        return True
    return False


def streaming_corpus_ingest(
    spark: SparkSession,
    doc_stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Start the ingest query over a stream of (doc_id, ts, text,
    source): gate → fingerprint → within-watermark stream dedup →
    corpus-index anti-join → append parquet at ``out_dir``."""
    index = spark.read.parquet(index_dir)
    accepted = (
        doc_stream.withColumn("quality", quality_score(F.col("text")))
        .filter(F.col("quality") >= QUALITY_GATE)
        .withColumn("fp", F.sha2(F.col("text"), 256))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .join(index, "fp", "left_anti")
    )
    return (
        accepted.select("doc_id", "ts", "text", "source", "quality", "fp")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def batch_ingest_expectation(docs: DataFrame, index: DataFrame) -> DataFrame:
    """Batch twin — the parity spec for inputs whose duplicates fall
    within one watermark horizon (the tests'): gate,
    first-arrival-per-fingerprint (ties by earliest ts then doc_id,
    matching the replay order the tests feed one file per trigger),
    corpus anti-join. Beyond-watermark duplicates are the compaction
    cycle's job (module docstring) — the stream matches this spec
    exactly when every duplicate pair is either within-watermark or
    separated by a compaction."""
    from pyspark.sql import Window

    gated = (
        docs.withColumn("quality", quality_score(F.col("text")))
        .filter(F.col("quality") >= QUALITY_GATE)
        .withColumn("fp", F.sha2(F.col("text"), 256))
    )
    w = Window.partitionBy("fp").orderBy("ts", "doc_id")
    first = gated.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return first.join(index, "fp", "left_anti").select(
        "doc_id", "ts", "text", "source", "quality", "fp"
    )


def ingest_fp_expectation(docs: DataFrame, index: DataFrame) -> DataFrame:
    """The ORDER-ROBUST parity spec: the set of accepted fingerprints
    (gate, distinct fp, corpus anti-join) with no claim about WHICH
    representative row carried each. ``batch_ingest_expectation``'s
    row-level spec additionally pins the kept row to min-(ts, doc_id),
    which matches the stream only when arrival order follows event
    time; dropDuplicatesWithinWatermark keeps the first ARRIVAL, so on
    an out-of-order production stream row-level identity can differ
    while this fingerprint-set invariant still holds exactly — it is
    the right spec to assert against reordered replays."""
    gated = docs.withColumn("quality", quality_score(F.col("text"))).filter(
        F.col("quality") >= QUALITY_GATE
    )
    fps = gated.select(F.sha2(F.col("text"), 256).alias("fp")).distinct()
    return fps.join(index, "fp", "left_anti")
