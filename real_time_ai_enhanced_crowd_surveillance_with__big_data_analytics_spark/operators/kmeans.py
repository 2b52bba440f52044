"""Iterative Lloyd k-means over an embedding column (the loop whose
single step is ``plans/similarity.py::kmeans_refine``).

Driver-iterated distributed loop — the standard Spark shape for
fixed-point algorithms (same pattern as
``operators/connected_components.py``): each round broadcasts the k×d
centroid matrix, one ``mapInPandas`` pass assigns every vector AND
pre-aggregates per-cluster (sum-vector, count, inertia) partials
per Arrow batch, and a tiny groupBy over ≤ k×batches partial rows
finishes the reduction. The corpus is scanned once per round and
NOTHING corpus-sized ever shuffles or reaches the driver — the only
driver state is the k×d matrix itself.

Determinism: Euclidean argmin with first-minimum (lowest cluster id)
tie-break; init = the k vectors with the smallest ids. Inertia is
monotone non-increasing round over round (Lloyd's guarantee), which
the tests assert.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partials_fn(bc):
    import pandas as pd

    def fn(batches):
        cm = bc.value  # k×d
        k, d = cm.shape
        for pdf in batches:
            a = np.asarray(pdf["embedding"].tolist(), dtype="float64")
            # ||a-c||² = ||a||² - 2a·c + ||c||²; argmin over c
            d2 = (
                (a * a).sum(axis=1)[:, None]
                - 2.0 * (a @ cm.T)
                + (cm * cm).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            rows = []
            for c in np.unique(assign):
                m = assign == c
                rows.append(
                    (
                        int(c),
                        a[m].sum(axis=0).tolist(),
                        int(m.sum()),
                        float(d2[m, c].sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["cluster", "vsum", "n", "inertia"]
            )

    return fn


def _assign_fn(bc):
    import pandas as pd

    def fn(batches):
        cm = bc.value
        for pdf in batches:
            a = np.asarray(pdf["embedding"].tolist(), dtype="float64")
            d2 = (
                (a * a).sum(axis=1)[:, None]
                - 2.0 * (a @ cm.T)
                + (cm * cm).sum(axis=1)[None, :]
            )
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster": d2.argmin(axis=1)}
            )

    return fn


def lloyd_kmeans(
    emb: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray, list[float]]:
    """Run ``iters`` Lloyd rounds; returns (assignments DataFrame
    (id, cluster), final k×d centroid matrix, per-round inertia).

    An empty cluster keeps its previous centroid (the deterministic
    convention; k-means++ reseeding would break replay determinism).
    """
    spark = emb.sparkSession
    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias(
        "embedding"
    ))
    init = (
        src.orderBy("vec_id").limit(k).orderBy("vec_id").collect()
    )
    cmat = np.asarray([list(r.embedding) for r in init], dtype="float64")
    inertia_history: list[float] = []
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cmat)
        partials = src.mapInPandas(
            _partials_fn(bc),
            schema="cluster int, vsum array<double>, n long, inertia double",
        )
        agg = (
            partials.groupBy("cluster")
            .agg(
                F.aggregate(
                    F.collect_list("vsum"),
                    F.array_repeat(F.lit(0.0), int(cmat.shape[1])),
                    lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y),
                ).alias("vsum"),
                F.sum("n").alias("n"),
                F.sum("inertia").alias("inertia"),
            )
            .collect()
        )
        new_c = cmat.copy()
        total_inertia = 0.0
        for r in agg:
            new_c[r.cluster] = np.asarray(r.vsum) / r.n
            total_inertia += r.inertia
        inertia_history.append(total_inertia)
        cmat = new_c
        bc.destroy()
    bc = spark.sparkContext.broadcast(cmat)
    labels = src.mapInPandas(_assign_fn(bc), schema="vec_id long, cluster int")
    return labels, cmat, inertia_history
