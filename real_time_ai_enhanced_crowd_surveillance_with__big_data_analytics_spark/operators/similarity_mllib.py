"""MLlib-backed approximate similarity (SURVEY.md §4.4: wiring
``BucketedRandomProjectionLSH``/``approxSimilarityJoin`` into the query
surface; the scale path Spark ships in-box).

The hand-rolled sign-LSH / MinHash plans (plans/similarity.py,
plans/dedup.py) exist because their arithmetic is DuckDB-oracle
portable; the MLlib estimators here are the production alternative —
same API shape, JVM-native hashing, seeded for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    HAS_MLLIB = True
except ImportError:  # pragma: no cover
    HAS_MLLIB = False

SEED = 42


def ann_similarity_join(
    emb: DataFrame,
    dist_threshold: float,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Euclidean approxSimilarityJoin of the embeddings table with
    itself: pairs within ``dist_threshold``. Deterministic under the
    fixed seed. Returns (ia, ib, dist) with ia < ib."""
    if not HAS_MLLIB:  # pragma: no cover
        raise ImportError("pyspark.ml not available")
    vecs = emb.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=SEED,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, dist_threshold, distCol="dist")
    return (
        joined.select(
            F.col("datasetA.vec_id").alias("ia"),
            F.col("datasetB.vec_id").alias("ib"),
            F.round("dist", 6).alias("dist"),
        )
        .filter(F.col("ia") < F.col("ib"))
    )
