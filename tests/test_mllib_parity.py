"""MLlib-boundary parity (SURVEY §2 names MLlib Normalizer /
MinHashLSH / BucketedRandomProjectionLSH as the library alternative to
this repo's hand-built similarity operators): prove the hand-built
semantics agree with MLlib on the same data — the custom operators are
a choice, not a divergence.

Kept at the MLlib boundary: VectorUDT only inside these tests, per the
data-model rule in SURVEY §2."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    MinHashLSH,
    Normalizer,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.similarity import (
    knn_bruteforce,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)

SF = "/root/testdata/sf0.001"


def test_cosine_topk_equals_euclidean_on_normalized_vectors(spark):
    """knn_bruteforce's cosine top-10 must equal exact euclidean top-10
    after MLlib L2 normalization (cos and L2-distance are monotone
    duals on the unit sphere) — library-independent semantics of the
    ANN baseline."""
    ours = [r["vec_id"] for r in knn_bruteforce(spark, SF).collect()]
    emb = load_table(spark, "embeddings", SF).select(
        "vec_id", array_to_vector(F.col("embedding")).alias("v")
    )
    normed = Normalizer(inputCol="v", outputCol="nv", p=2.0).transform(emb)
    rows = {r["vec_id"]: r["nv"] for r in normed.collect()}
    q = rows[0]
    dists = sorted(
        (float(q.squared_distance(v)), vid)
        for vid, v in rows.items()
        if vid != 0
    )
    mllib_top = [vid for _, vid in dists[:10]]
    assert ours == mllib_top


@pytest.fixture(scope="module")
def exact_pairs():
    """Ground-truth 3-gram Jaccard >= 0.5 doc pairs, straight SQL."""
    con = duckdb.connect()
    return set(
        map(
            tuple,
            con.sql(f"""
      WITH toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS t
        FROM read_parquet('{SF}/documents.parquet')
      ), grams AS (
        SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
      ), counts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
      shared AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS s
        FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT ia, ib FROM shared
      JOIN counts ca ON ca.doc_id = ia JOIN counts cb ON cb.doc_id = ib
      WHERE CAST(s AS DOUBLE) / (ca.n + cb.n - s) >= 0.5
    """).fetchall(),
        )
    )


def test_mllib_minhash_lsh_recovers_exact_jaccard_pairs(spark, exact_pairs):
    """MinHashLSH approxSimilarityJoin at distance <= 0.5 (Jaccard >=
    0.5) over the same 3-gram sets must recover every exact pair —
    approxSimilarityJoin verifies candidates with the TRUE distance, so
    with enough hash tables recall should be total on this corpus; any
    miss would mean our shingle construction and MLlib's set semantics
    disagree."""
    assert exact_pairs, "no ground-truth pairs — vacuous"
    docs = load_table(spark, "documents", SF)
    grams = docs.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(1, size(split(trim(text), ' ')) - 2), "
                "i -> concat_ws(' ', slice(split(trim(text), ' '), i, 3)))"
            )
        ).alias("grams"),
    ).filter(F.size("grams") > 0)
    vocab = (
        grams.select(F.explode("grams").alias("g"))
        .distinct()
        .withColumn("gid", F.monotonically_increasing_id())
    )
    ids = (
        grams.select("doc_id", F.explode("grams").alias("g"))
        .join(vocab, "g")
        .groupBy("doc_id")
        .agg(F.collect_set("gid").alias("gids"))
    )
    from pyspark.ml.linalg import Vectors, VectorUDT

    size = vocab.count()
    to_vec = F.udf(
        lambda gids: Vectors.sparse(
            size, sorted(int(g) for g in gids), [1.0] * len(gids)
        ),
        VectorUDT(),
    )
    feats = ids.select("doc_id", to_vec("gids").alias("v"))
    model = MinHashLSH(
        inputCol="v", outputCol="h", numHashTables=8, seed=42
    ).fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 0.5, distCol="d")
    got = {
        (int(r["datasetA"]["doc_id"]), int(r["datasetB"]["doc_id"]))
        for r in joined.collect()
        if r["datasetA"]["doc_id"] < r["datasetB"]["doc_id"]
    }
    assert exact_pairs <= got


def test_brp_lsh_neighbors_are_sound(spark):
    """BucketedRandomProjectionLSH approxNearestNeighbors(k=10) on raw
    embeddings: every returned distance must be genuine (verified
    against exact arithmetic) and the exact nearest neighbor must be
    in the approximate top-10 with a healthy table count."""
    emb = load_table(spark, "embeddings", SF).select(
        "vec_id", array_to_vector(F.col("embedding")).alias("v")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="h", bucketLength=0.5, numHashTables=6, seed=7
    ).fit(emb)
    rows = {r["vec_id"]: r["v"] for r in emb.collect()}
    q = rows[0]
    res = model.approxNearestNeighbors(
        emb.filter(F.col("vec_id") != 0), q, 10, distCol="d"
    ).collect()
    assert res
    for r in res:
        exact = float(q.squared_distance(rows[r["vec_id"]])) ** 0.5
        assert abs(r["d"] - exact) < 1e-6
    true_nn = min(
        (float(q.squared_distance(v)), vid)
        for vid, v in rows.items()
        if vid != 0
    )[1]
    assert true_nn in {r["vec_id"] for r in res}
