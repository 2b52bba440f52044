"""Persisted IVF index: the disk-level form of plans/similarity.py's
in-flight IVF — build once, store the corpus cell-partitioned, and
answer queries by READING only the probed cells (parquet partition
pruning), not by scanning-then-filtering.

This is the piece that changes the I/O complexity, not just the
compute: `ivf_knn` still scans every row to assign cells per query;
with the index persisted as ``cell=<label>/`` partitions, a
``nprobe``-cell query touches ~nprobe/k of the BYTES on disk (the
test asserts PartitionFilters in the scan plan). Same layout
argument as operators/historical.py's time-partitioned store, applied
to vector search — at 100 TB this is the difference between an ANN
query costing a full-corpus scan and costing a bounded probe read.

Cell assignment = nearest centroid (cosine, round-6, label-asc ties —
identical arithmetic to plans/similarity.py::nearest_centroid, so the
persisted assignment matches the in-flight one)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _centroids(emb: DataFrame) -> tuple:
    """label → mean vector, as numpy (labels asc, matrix row-aligned) —
    delegates to plans/similarity.py::_centroid_matrix so the persisted
    index's cell arithmetic is THE SAME CODE as nearest_centroid /
    ivf_knn's in-flight assignment (not a parallel copy that can
    drift). Rejects an empty corpus with a clear error."""
    if emb.limit(1).count() == 0:
        raise ValueError("cannot build an IVF index from an empty corpus")
    from ..plans.similarity import _centroid_matrix

    return _centroid_matrix(emb)


def build_ivf_index(emb: DataFrame, index_dir: str) -> None:
    """Assign every vector to its nearest centroid cell and persist the
    corpus partitioned by ``cell`` (plus the centroid table). One
    mapInPandas assignment pass + one partitioned write."""
    import numpy as np
    import pandas as pd

    labs, cmat = _centroids(emb)
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0.0] = 1.0
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((labs, cmat, cnorm))

    def assign(batches):
        labs_b, cm, cn = bc.value
        for pdf in batches:
            x = np.asarray(pdf["embedding"].tolist(), dtype="float64")
            if x.size == 0:
                continue
            xn = np.linalg.norm(x, axis=1)
            xn[xn == 0.0] = 1.0
            sims = np.round(x @ cm.T / (xn[:, None] * cn[None, :]), 6)
            # ties: smallest label wins (argmax returns first maximum,
            # labels are sorted ascending) — nearest_centroid semantics
            cell = labs_b[sims.argmax(axis=1)]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "embedding": pdf["embedding"],
                    "cell": cell,
                }
            )

    (
        emb.select("vec_id", "embedding")
        .mapInPandas(
            assign, schema="vec_id long, embedding array<float>, cell long"
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{index_dir}/vectors")
    )
    cent = [
        (int(lab), [float(v) for v in cmat[i]]) for i, lab in enumerate(labs)
    ]
    spark.createDataFrame(
        cent, "label long, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")


def ivf_probe_query(
    spark: SparkSession,
    index_dir: str,
    qvec,
    k: int = 10,
    nprobe: int = 3,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbours of ``qvec`` reading ONLY the ``nprobe``
    nearest cells' partitions. Probe selection is driver-side over the
    tiny centroid table; the vectors scan carries a
    ``cell IN (probes)`` filter that parquet partition pruning turns
    into reading just those directories."""
    import numpy as np
    import pandas as pd

    q = np.asarray(qvec, dtype="float64")
    qn = float(np.linalg.norm(q)) or 1.0
    cent = spark.read.parquet(f"{index_dir}/centroids").collect()
    cent.sort(key=lambda r: r["label"])
    labs = np.asarray([r["label"] for r in cent], dtype="int64")
    cmat = np.asarray([list(r["centroid"]) for r in cent], dtype="float64")
    cn = np.linalg.norm(cmat, axis=1)
    cn[cn == 0.0] = 1.0
    csim = np.round(cmat @ q / (cn * qn), 6)
    order = np.lexsort((labs, -csim))
    probes = [int(v) for v in labs[order[:nprobe]]]

    vecs = spark.read.parquet(f"{index_dir}/vectors").filter(
        F.col("cell").isin(probes)
    )
    if exclude_vec_id is not None:
        vecs = vecs.filter(F.col("vec_id") != exclude_vec_id)
    bc = spark.sparkContext.broadcast((q, qn))

    def score(batches):
        qv, qnb = bc.value
        for pdf in batches:
            x = np.asarray(pdf["embedding"].tolist(), dtype="float64")
            if x.size == 0:
                continue
            xn = np.linalg.norm(x, axis=1)
            xn[xn == 0.0] = 1.0
            cos = np.round(x @ qv / (xn * qnb), 6)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "cosine": cos}
            )

    scored = vecs.mapInPandas(score, schema="vec_id long, cosine double")
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)
