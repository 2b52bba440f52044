"""Array-math goldens vs numpy (SURVEY.md §5.2: softmax/top-k against
torch/numpy-computed values; reference CLIP math main.py:70-88)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.functions.arrays import (
    cosine_sim,
    dot,
    l2_norm,
    l2_normalize,
    softmax,
)

VECS = [
    ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
    ([0.5, -0.5, 0.0], [1.0, 1.0, 1.0]),
    ([-1.0, -2.0, 2.5], [0.1, 0.2, 0.3]),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(a, b) for a, b in VECS], "a array<double>, b array<double>"
    )


def test_dot_and_norm_match_numpy(df):
    rows = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        l2_norm(F.col("a")).alias("na"),
    ).collect()
    for (a, b), r in zip(VECS, rows):
        assert r.d == pytest.approx(float(np.dot(a, b)), abs=1e-12)
        assert r.na == pytest.approx(float(np.linalg.norm(a)), abs=1e-12)


def test_cosine_matches_numpy(df):
    rows = df.select(cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()
    for (a, b), r in zip(VECS, rows):
        want = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r.c == pytest.approx(want, abs=1e-12)


def test_l2_normalize_unit_length(df):
    rows = df.select(l2_normalize(F.col("a")).alias("u")).collect()
    for r in rows:
        assert math.isclose(sum(x * x for x in r.u), 1.0, abs_tol=1e-12)


def test_softmax_matches_numpy_and_sums_to_one(df):
    rows = df.select(softmax(F.col("a")).alias("p")).collect()
    for (a, _), r in zip(VECS, rows):
        e = np.exp(np.array(a) - np.max(a))
        want = e / e.sum()
        assert np.allclose(r.p, want, atol=1e-12)
        assert math.isclose(sum(r.p), 1.0, abs_tol=1e-12)
