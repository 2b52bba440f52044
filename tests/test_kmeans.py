"""Iterative Lloyd k-means: parity with a pure-numpy reference on the
same init/tie rules, Lloyd's monotone-inertia guarantee, and the
distributed-loop invariants (nothing corpus-sized on the driver).
"""

from __future__ import annotations

import numpy as np
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.kmeans import (
    lloyd_kmeans,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)

K, ITERS = 8, 4


def _numpy_lloyd(vecs: np.ndarray, k: int, iters: int):
    cmat = vecs[:k].copy()
    hist = []
    for _ in range(iters):
        d2 = (
            (vecs * vecs).sum(axis=1)[:, None]
            - 2.0 * (vecs @ cmat.T)
            + (cmat * cmat).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        hist.append(float(d2[np.arange(len(vecs)), assign].sum()))
        new_c = cmat.copy()
        for c in range(k):
            m = assign == c
            if m.any():
                new_c[c] = vecs[m].mean(axis=0)
        cmat = new_c
    d2 = (
        (vecs * vecs).sum(axis=1)[:, None]
        - 2.0 * (vecs @ cmat.T)
        + (cmat * cmat).sum(axis=1)[None, :]
    )
    return d2.argmin(axis=1), cmat, hist


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    labels, cmat, hist = lloyd_kmeans(emb, k=K, iters=ITERS)
    rows = sorted(
        ((r.vec_id, r.cluster) for r in labels.collect())
    )
    vec_rows = emb.select("vec_id", "embedding").collect()
    vec_rows.sort(key=lambda r: r.vec_id)
    vecs = np.asarray([list(r.embedding) for r in vec_rows], dtype="float64")
    return rows, cmat, hist, vecs


def test_matches_numpy_reference(fitted):
    rows, cmat, hist, vecs = fitted
    ref_assign, ref_c, ref_hist = _numpy_lloyd(vecs, K, ITERS)
    assert np.allclose(cmat, ref_c, atol=1e-9)
    assert [c for _, c in rows] == ref_assign.tolist()
    assert np.allclose(hist, ref_hist, rtol=1e-12)


def test_inertia_monotone_nonincreasing(fitted):
    _, _, hist, _ = fitted
    assert len(hist) == ITERS
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-6, hist


def test_every_vector_assigned_to_valid_cluster(fitted):
    rows, _, _, vecs = fitted
    assert len(rows) == len(vecs)
    assert {c for _, c in rows} <= set(range(K))
