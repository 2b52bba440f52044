"""Zero-cost pipeline telemetry via Spark's Observation API
(SURVEY.md §5 operational posture).

A corpus build at 100 TB cannot afford a second pass just to count
what it kept; ``df.observe()`` piggybacks accumulator-backed metrics
on the action that already runs — row counts, null rates, quality
means arrive with the job, for free. The reference's equivalent is
the ad-hoc per-frame print/counter scattering (main.py:210-233);
here the counters are declarative aggregates attached to the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_build_observation(
    df: DataFrame, quality_col: str = "quality", token_col: str = "n_tok"
) -> tuple[DataFrame, Observation]:
    """Attach kept-corpus telemetry to a build frame: row count, token
    total, mean quality, and null-quality count, all computed inside
    whatever action consumes ``df`` (no extra scan). Read
    ``observation.get`` AFTER the action."""
    obs = Observation("corpus_build")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).alias("n_tokens"),
        F.round(F.avg(F.col(quality_col)), 6).alias("mean_quality"),
        F.count_if(F.col(quality_col).isNull()).alias("null_quality"),
    )
    return observed, obs
