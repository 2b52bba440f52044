"""Skew-mitigation join: explicit key salting (SURVEY.md 'Partitioning
& shuffle'; complements AQE's runtime skew-join splitting).

When one join key dominates (a hot camera, a viral document), hash
partitioning sends its whole payload to one task. Salting splits the
hot side's rows across ``salt_buckets`` sub-keys and replicates the
other side once per bucket — turning one straggler task into
``salt_buckets`` even ones. AQE's skewJoin handles this adaptively for
sort-merge joins; the explicit form here also covers aggregations and
is deterministic for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a skewed ``key`` distribution on ``skewed``.

    The skewed side gets a random-but-deterministic salt from its own
    row content (hash of all columns, stable across retries — no rand(),
    which would break replay/resume); the other side is replicated
    ``salt_buckets`` times via explode. Result equals a plain join.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets))
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = left.join(right, [key, "_salt"], how)
    return out.drop("_salt")
