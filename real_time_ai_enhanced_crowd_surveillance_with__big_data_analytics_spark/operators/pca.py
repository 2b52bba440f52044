"""Distributed PCA over the embeddings table, the way RowMatrix does
it: the d×d covariance reduces out of one mapInPandas pass
(plans/stats.py::embedding_covariance is the oracle-checked spec of
that statistic), the eigendecomposition runs driver-side on the tiny
d×d result, and projection back over the corpus is a broadcast-matmul
map pass.

Only d² floats ever reach the driver — the corpus itself never moves.
At 100 TB this is the standard two-pass shape: statistics pass
(tree-reduced partials) + transform pass (map-only). Used for
embedding compression (store k≪d components), whitening before
cosine retrieval, and drift diagnostics on stored vectors.

No SQL oracle (eigensolvers are not SQL); test_pca pins parity with
numpy PCA on the collected corpus, explained-variance ordering, and
monotone reconstruction error in k.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes, variance-desc
    explained_variance: np.ndarray  # (k,)


def _moments(emb: DataFrame) -> tuple[np.ndarray, np.ndarray, int]:
    """One mapInPandas statistics pass → (mean, covariance, n). Same
    partial-Gram reduce as embedding_covariance, kept dense here since
    the consumer is the eigensolver, not a relation."""
    import pandas as pd

    first = emb.select(F.size("embedding").alias("d")).first()
    if first is None:
        raise ValueError("empty embeddings input")
    d = first["d"]

    def partials(batches):
        for pdf in batches:
            x = np.asarray(pdf["embedding"].tolist(), dtype="float64")
            if x.size == 0:
                continue
            yield pd.DataFrame(
                {
                    "gram": [(x.T @ x).ravel().tolist()],
                    "s": [x.sum(axis=0).tolist()],
                    "n": [len(x)],
                }
            )

    rows = (
        emb.select("embedding")
        .mapInPandas(
            partials, schema="gram array<double>, s array<double>, n long"
        )
        .collect()
    )
    gram = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for r in rows:
        gram += np.asarray(r["gram"]).reshape(d, d)
        s += np.asarray(r["s"])
        n += r["n"]
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    return mean, cov, n


def fit_pca(emb: DataFrame, k: int) -> PCAModel:
    """Fit k principal components. Deterministic up to sign; signs are
    canonicalized (largest-|coefficient| entry of each component made
    positive) so refits and engines agree."""
    mean, cov, _ = _moments(emb)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    for row in comps:
        pivot = np.argmax(np.abs(row))
        if row[pivot] < 0:
            row *= -1
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(vals[order], 0.0),
    )


def project(emb: DataFrame, model: PCAModel) -> DataFrame:
    """Map-only projection: (vec_id, proj array<double> length k).
    Components ride as a plain closure broadcast; each Arrow batch is
    one centered BLAS matmul."""
    import pandas as pd

    comps = model.components
    mean = model.mean

    def do(batches):
        for pdf in batches:
            x = np.asarray(pdf["embedding"].tolist(), dtype="float64")
            if x.size == 0:
                continue
            p = (x - mean) @ comps.T
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "proj": list(p)}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        do, schema="vec_id long, proj array<double>"
    )


def reconstruction_mse(emb: DataFrame, model: PCAModel) -> float:
    """Corpus-mean squared reconstruction error ‖x − x̂‖²/d for the
    fitted k — the metric that picks k. Single map pass + one scalar
    agg; nothing corpus-sized is collected."""
    import pandas as pd

    comps = model.components
    mean = model.mean

    def do(batches):
        for pdf in batches:
            x = np.asarray(pdf["embedding"].tolist(), dtype="float64")
            if x.size == 0:
                continue
            c = x - mean
            err = c - (c @ comps.T) @ comps
            yield pd.DataFrame(
                {"se": [float((err**2).sum())], "n": [len(x)]}
            )

    row = (
        emb.select("embedding")
        .mapInPandas(do, schema="se double, n long")
        .agg(F.sum("se").alias("se"), F.sum("n").alias("n"))
        .first()
    )
    return float(row["se"]) / (row["n"] * model.mean.shape[0])
