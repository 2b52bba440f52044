"""Streaming drift monitor: maintain per-window value-histogram bin
counts from the event stream and read PSI (Population Stability
Index) per (window, type) against a reference distribution — the
live twin of ``plans/stats.py::value_drift_psi``, which is the
batch/backfill form of the same monitor.

Pattern (same exactly-once recipe as streaming/rollup.py): update-mode
windowed aggregate → foreachBatch → DYNAMIC partition overwrite. Here
the aggregate key (hour, type, bin) IS the partition key, so a
replayed micro-batch rewrites exactly the partitions it changed with
identical totals — idempotent without a transactional format. The
partition count stays calendar-bounded: hours × types × HIST_BINS.

PSI itself is computed at READ time from the maintained table joined
to a broadcast reference distribution — the maintained table is
dashboard-sized, so the read-side join/window never touches the
stream's raw volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.stats import HIST_BINS, HIST_WIDTH, PSI_EPS
from .rollup import partition_upsert_writer


def _bin_id() -> F.Column:
    """Identical integer bin arithmetic to the batch histogram/PSI
    plans — shared constants keep stream and batch comparable."""
    return F.least(
        F.lit(HIST_BINS - 1),
        F.greatest(F.lit(0), F.floor(F.col("value") / HIST_WIDTH)),
    ).cast("int")


def streaming_bin_counts(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "35 days",
) -> StreamingQuery:
    """Maintain the on-disk per-(hour, type, bin) count table. Readable
    at any time with ``spark.read.parquet``; late rows inside the
    watermark update their bin's partition in place."""
    agg = (
        events.withWatermark("ts", watermark)
        .select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH").alias(
                "bucket_hour"
            ),
            "event_type",
            _bin_id().alias("bin"),
        )
        .groupBy("bucket_hour", "event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    upsert = partition_upsert_writer(
        out_dir, ("bucket_hour", "event_type", "bin")
    )
    return (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert)
        .start()
    )


def reference_shares(events: DataFrame) -> DataFrame:
    """Reference bin distribution per type from a trusted batch corpus
    (training-time feature distribution). Tiny: types × bins rows."""
    counts = (
        events.select("event_type", _bin_id().alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )
    tot = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "bin",
        (F.col("n_ref") / F.sum("n_ref").over(tot)).alias("p_ref"),
    )


def _psi_from_counts(cur: DataFrame, reference: DataFrame) -> DataFrame:
    """PSI per (bucket_hour, event_type) from a (…, bin, n) count
    relation vs the reference: Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref),
    shares floored at PSI_EPS on both sides of the ratio (batch-plan
    arithmetic). The window × reference-bin grid keeps bins that are
    missing on either side in the sum (as eps) instead of silently
    dropping them."""
    tot = Window.partitionBy("bucket_hour", "event_type")
    cur_shares = cur.select(
        "bucket_hour",
        "event_type",
        "bin",
        (F.col("n") / F.sum("n").over(tot)).alias("p_cur_raw"),
    )
    # the bin universe per window is the UNION of reference bins and
    # observed bins: a full outer join against the windows × reference
    # grid keeps novel bins (and wholly novel event types) in the sum
    # with p_ref = eps — dropping them is exactly the understate-drift
    # failure mode a monitor must not have
    windows = cur_shares.select("bucket_hour", "event_type").distinct()
    ref_grid = windows.join(F.broadcast(reference), "event_type")
    joined = ref_grid.join(
        cur_shares, ["bucket_hour", "event_type", "bin"], "full_outer"
    ).select(
        "bucket_hour",
        "event_type",
        F.greatest(F.coalesce(F.col("p_cur_raw"), F.lit(0.0)), F.lit(PSI_EPS)).alias(
            "p_cur"
        ),
        F.greatest(F.coalesce(F.col("p_ref"), F.lit(0.0)), F.lit(PSI_EPS)).alias(
            "p_ref"
        ),
    )
    return (
        joined.groupBy("bucket_hour", "event_type")
        .agg(
            F.round(
                F.sum(
                    (F.col("p_cur") - F.col("p_ref"))
                    * F.log(F.col("p_cur") / F.col("p_ref"))
                ),
                6,
            ).alias("psi")
        )
        .withColumn("alert", F.col("psi") > 0.2)
    )


def psi_per_window(
    spark: SparkSession, table_dir: str, reference: DataFrame
) -> DataFrame:
    """Read-side PSI over the streaming-maintained bin table. The table
    is dashboard-sized, so this never touches the stream's raw volume."""
    return _psi_from_counts(spark.read.parquet(table_dir), reference)


def batch_psi_per_window(events: DataFrame, reference: DataFrame) -> DataFrame:
    """Batch twin over raw events — the parity spec for tests: the
    streaming-maintained table must yield the identical PSI relation."""
    cur = (
        events.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH").alias(
                "bucket_hour"
            ),
            "event_type",
            _bin_id().alias("bin"),
        )
        .groupBy("bucket_hour", "event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _psi_from_counts(cur, reference)
