"""Distributed PCA (operators/pca.py): parity with numpy PCA on the
collected corpus, variance ordering, monotone reconstruction error,
and a map-only projection plan."""

from __future__ import annotations

import numpy as np

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.pca import (
    fit_pca,
    project,
    reconstruction_mse,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def _corpus(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return emb, np.asarray([list(r.embedding) for r in rows], dtype="float64")


def test_matches_numpy_pca(spark, sf_dir):
    emb, x = _corpus(spark, sf_dir)
    k = 8
    model = fit_pca(emb, k)
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / len(x)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    want = vecs[:, order].T
    for row in want:
        p = np.argmax(np.abs(row))
        if row[p] < 0:
            row *= -1
    assert np.allclose(model.mean, mean, atol=1e-9)
    assert np.allclose(model.components, want, atol=1e-6)
    assert np.allclose(
        model.explained_variance, np.sort(vals)[::-1][:k], atol=1e-9
    )
    # variance sorted descending
    assert all(
        a >= b - 1e-12
        for a, b in zip(model.explained_variance, model.explained_variance[1:])
    )


def test_projection_matches_local_and_is_map_only(spark, sf_dir):
    emb, x = _corpus(spark, sf_dir)
    model = fit_pca(emb, 4)
    proj = project(emb, model)
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["vec_id"]: np.asarray(r["proj"]) for r in proj.collect()}
    want = (x - model.mean) @ model.components.T
    ids = sorted(got)
    assert np.allclose(
        np.asarray([got[i] for i in ids]), want, atol=1e-9
    )


def test_reconstruction_error_monotone_in_k(spark, sf_dir):
    emb, _ = _corpus(spark, sf_dir)
    errs = [reconstruction_mse(emb, fit_pca(emb, k)) for k in (2, 8, 32, 64)]
    assert all(a >= b - 1e-12 for a, b in zip(errs, errs[1:]))
    # full rank reconstructs exactly
    assert errs[-1] < 1e-18
