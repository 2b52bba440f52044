"""Streaming source-mixture monitor: maintain per-(source, token-bucket)
counts from the document stream and read per-source Jensen-Shannon
divergence vs all other sources off the maintained table — the live
twin of ``plans/text.py::js_divergence_sources``, with the unbounded
token vocabulary folded onto a FIXED bucket universe so streaming
state stays bounded (sources × {N} buckets, forever, no watermark
needed — the aggregate keys are static, not event-time windows).

Bucketing and what it means for alerts: token → Spark hash → bucket
``pmod(hash(term), {N})``. Bucketing is a deterministic coarsening of
the token distribution, so by the data-processing inequality the
bucket-level JSD LOWER-BOUNDS the token-level JSD — a bucket-level
alert is always real mixture drift (no false alarms from the
coarsening; the batch token-level query is the forensic refinement
that quantifies how much worse it really is). The parity test pins
the inequality on real data.

Exactly-once recipe (same as streaming/drift.py): update-mode
aggregate → foreachBatch → DYNAMIC partition overwrite where the
aggregate key (source, bucket) IS the partition key, so a replayed
micro-batch rewrites exactly the partitions it changed with identical
totals — idempotent without a transactional format.

Read side reuses the batch operator's sparse-exact arithmetic: only
existing (source, bucket) rows are touched and the rest-only bucket
mass enters through the ``½·ln2·(1 − Σ_present q)`` closed form. The
maintained table is dashboard-sized (sources × buckets), so the read
never touches the stream's raw volume.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.text import tokens
from .rollup import partition_upsert_writer

N_TOKEN_BUCKETS = 256
JSD_ALERT = 0.1  # nats; ln 2 ≈ 0.693 is the metric's ceiling

if __doc__:  # absent under python -OO
    __doc__ = __doc__.format(N=N_TOKEN_BUCKETS)


def _bucketed(docs: DataFrame) -> DataFrame:
    """(source, bucket) per token occurrence. Spark's hash is stable
    across the stream and its batch twin (both JVM sides); no DuckDB
    oracle is involved on the streaming path, so portability of the
    hash does not matter here — determinism within Spark does."""
    return docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    ).select(
        "source",
        F.pmod(F.hash("term"), F.lit(N_TOKEN_BUCKETS)).alias("bucket"),
    )


def streaming_bucket_counts(
    docs: DataFrame, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Maintain the on-disk (source, bucket) → n table. Readable at any
    time with ``spark.read.parquet``; a replayed batch rewrites its
    partitions with identical totals (idempotent)."""
    agg = _bucketed(docs).groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    upsert = partition_upsert_writer(out_dir, ("source", "bucket"))
    return (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert)
        .start()
    )


def _jsd_from_counts(cnt: DataFrame) -> DataFrame:
    """Per-source JSD-vs-rest from a (source, bucket, n) relation —
    the batch operator's sparse closed-form arithmetic on the bucket
    grid."""
    tot = cnt.groupBy("source").agg(F.sum("n").alias("n_s"))
    gb = cnt.groupBy("bucket").agg(F.sum("n").alias("g"))
    grand = tot.agg(F.sum("n_s").alias("n_all"))  # 1-row broadcast
    p = F.col("n") / F.col("n_s")
    q = (F.col("g") - F.col("n")) / (F.col("n_all") - F.col("n_s"))
    m = (p + q) / F.lit(2.0)
    contrib = F.lit(0.5) * (
        p * F.log(p / m)
        + F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    per_source = (
        cnt.join(F.broadcast(gb), "bucket")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(grand))
        .filter(F.col("n_all") > F.col("n_s"))
        .groupBy("source", "n_s")
        .agg(
            F.sum(contrib).alias("present_jsd"),
            F.sum(q).alias("q_present"),
        )
    )
    ln2 = math.log(2.0)
    return per_source.select(
        "source",
        F.col("n_s").alias("n_tokens"),
        F.round(
            F.col("present_jsd")
            + F.lit(0.5 * ln2) * (F.lit(1.0) - F.col("q_present")),
            6,
        ).alias("jsd_bucketed"),
    ).withColumn("alert", F.col("jsd_bucketed") > JSD_ALERT)


def jsd_per_source(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read-side JSD over the streaming-maintained bucket table."""
    return _jsd_from_counts(spark.read.parquet(table_dir))


def batch_jsd_per_source(docs: DataFrame) -> DataFrame:
    """Batch twin over raw documents — the parity spec for tests: the
    streaming-maintained table must yield the identical relation."""
    return _jsd_from_counts(
        _bucketed(docs).groupBy("source", "bucket").agg(
            F.count(F.lit(1)).alias("n")
        )
    )
