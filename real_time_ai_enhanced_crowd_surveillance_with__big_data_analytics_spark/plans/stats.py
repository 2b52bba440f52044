"""Distribution-statistics plans: fixed-bin histograms, winsorized
moments, and within-group quantile normalization.

The corpus-curation use: histograms drive mixture dashboards,
winsorized means are the robust per-source length/quality summary, and
quantile normalization puts scores from different sources on one scale
before cross-source sampling (the FineWeb/DCLM recipe normalizes
quality per dump before the global threshold).

All three are pure Column expressions — no UDFs — and every bin edge /
clip computation uses floor/least/greatest integer-exact arithmetic so
both engines bucket identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

HIST_WIDTH = 20.0
HIST_BINS = 25  # covers value ∈ [0, 500); out-of-range clamps to edge bins


def value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type fixed-bin histogram of ``value`` (25 bins × width 20,
    clamped edge bins). Sparse form — empty bins are absent; the dense
    spine is a calendar-style sequence join away if a UI needs it.

    One scan + one partial-aggregated shuffle on the bounded
    (type, bin) key; the bin id is ``least(greatest(floor(v/w)))`` —
    integer-exact on both engines, no interpolation to disagree on.
    """
    events = load_table(spark, "events", sf)
    bin_id = F.least(
        F.lit(HIST_BINS - 1),
        F.greatest(F.lit(0), F.floor(F.col("value") / HIST_WIDTH)),
    ).cast("int")
    return (
        events.groupBy("event_type", bin_id.alias("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "bin",
            (F.col("bin") * HIST_WIDTH).alias("bin_lo"),
            ((F.col("bin") + 1) * HIST_WIDTH).alias("bin_hi"),
            "n",
        )
    )


VALUE_HISTOGRAM_SQL = f"""
WITH binned AS (
  SELECT event_type,
         CAST(least({HIST_BINS - 1},
                    greatest(0, floor(value / {HIST_WIDTH}))) AS INT) AS bin
  FROM events
)
SELECT event_type, bin,
       bin * CAST({HIST_WIDTH} AS DOUBLE) AS bin_lo,
       (bin + 1) * CAST({HIST_WIDTH} AS DOUBLE) AS bin_hi,
       count(*) AS n
FROM binned
GROUP BY event_type, bin
"""


# --- winsorized per-source moments ------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorized_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source length summary with 5%/95% winsorization: clip
    ``n_chars`` at the exact per-source percentiles, then average —
    the outlier-robust per-source size profile.

    The percentile dim is ≤ n_sources rows, localCheckpointed and
    broadcast back onto the scan (same shape as ``robust_outliers``);
    the corpus is never shuffled. 100 TB path: ``approx_percentile``
    fused into a single pass.
    """
    docs = load_table(spark, "documents", sf)
    pct = (
        docs.groupBy("source")
        .agg(
            F.expr(f"percentile(n_chars, {WINSOR_LO})").alias("p_lo"),
            F.expr(f"percentile(n_chars, {WINSOR_HI})").alias("p_hi"),
        )
        .localCheckpoint()
    )
    clipped = docs.join(F.broadcast(pct), "source").withColumn(
        "clipped",
        F.least(F.greatest(F.col("n_chars").cast("double"), "p_lo"), "p_hi"),
    )
    return clipped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("raw_mean"),
        F.round(F.avg("clipped"), 6).alias("winsor_mean"),
        F.round(F.min("clipped"), 6).alias("winsor_min"),
        F.round(F.max("clipped"), 6).alias("winsor_max"),
    )


WINSORIZED_STATS_SQL = f"""
WITH pct AS (
  SELECT source,
         quantile_cont(n_chars, {WINSOR_LO}) AS p_lo,
         quantile_cont(n_chars, {WINSOR_HI}) AS p_hi
  FROM documents GROUP BY source
), clipped AS (
  SELECT d.source, d.n_chars,
         least(greatest(CAST(d.n_chars AS DOUBLE), p.p_lo), p.p_hi) AS clipped
  FROM documents d JOIN pct p USING (source)
)
SELECT source,
       count(*) AS n_docs,
       round(avg(n_chars), 6) AS raw_mean,
       round(avg(clipped), 6) AS winsor_mean,
       round(min(clipped), 6) AS winsor_min,
       round(max(clipped), 6) AS winsor_max
FROM clipped
GROUP BY source
"""


# --- within-source quantile normalization -----------------------------------

def quantile_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Map each doc's length onto its within-source quantile
    (percent_rank) — scores from different sources become comparable
    before a global threshold (the per-dump normalization step in
    FineWeb-style curation).

    One exchange on source; percent_rank is a per-partition sort with
    a deterministic (n_chars, doc_id) tiebreak. Sources are few but
    large at 100 TB — the window sort spills per partition rather than
    concentrating (range-partitioned sort within each source key via
    AQE skew handling; for a truly monster source, two-phase
    width_bucket over approx quantiles is the documented fallback in
    ``length_bucket_batches``).
    """
    docs = load_table(spark, "documents", sf)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(F.percent_rank().over(w), 6).alias("length_quantile"),
    )


QUANTILE_NORMALIZE_SQL = """
SELECT doc_id, source, n_chars,
       round(percent_rank() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id), 6)
         AS length_quantile
FROM documents
"""


STATS_QUERIES = {
    "value_histogram": (value_histogram, VALUE_HISTOGRAM_SQL),
    "winsorized_stats": (winsorized_stats, WINSORIZED_STATS_SQL),
    "quantile_normalize": (quantile_normalize, QUANTILE_NORMALIZE_SQL),
}
