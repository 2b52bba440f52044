"""Product quantization (PQ) over the embeddings table — the
memory-bounded ANN path the IVF index stops short of: instead of
storing full vectors per cell, PQ compresses every 64-dim embedding to
one 8-nibble code word (16 codes per 8-dim subspace), and queries score
candidates with asymmetric-distance (ADC) table lookups instead of
dot products. At 100 TB this is the difference between an index that
fits in executor memory and one that doesn't: 8 bytes/vector vs 256.

Standard construction (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011), re-derived integer-exact so the
driver can hash-compare against DuckDB:

- components are quantized ONCE to shifted milli-units
  (``floor(x*1000 + 0.5) + PQ_SHIFT`` — the shift keeps every value
  non-negative so Spark's truncating ``div`` and DuckDB's ``//``
  agree; squared distances are translation-invariant so the shift
  never reaches a result);
- codebooks are integer means (``sum div count``) — deterministic in
  any summation order, unlike float averages;
- all distances are int64 sums of int squares — order-independent, so
  argmins, code words, and ADC scores are bit-identical across
  engines and partitionings (the embedding_covariance cure, applied
  to a whole index build).

Training = one k-means round per subspace from the deterministic
``vec_id % K`` seed partition (the kmeans_refine convention:
one refinement step is the oracle-checkable spec; production loops it).

Scale shape: the long (vec_id, m, pos) explode is 64 rows per vector —
linear, and the centroid/distance joins all have a TINY build side
(M*K*SUBDIM = 1024 centroid rows, broadcastable forever). Encoding via
the (m,pos) equi-join + partial-aggregated groupBy is the
oracle-checkable spec; at 100 TB the same codebook (collected once,
~1 KB) drives a vectorized mapInPandas matmul encode — the
knn_batch/nearest_centroid pattern — with identical integer results.
ADC search joins the corpus CODES (8 rows/vector) against a
Q*M*K-row broadcast distance table and top-k's per query through
WindowGroupLimit, so the full scored fan-out never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

PQ_M = 8        # subspaces
PQ_SUBDIM = 8   # dims per subspace (M * SUBDIM = 64, the table's dim)
PQ_K = 16       # codes per subspace → one nibble each, 8-nibble word
PQ_MILLS = 1000  # component quantization: milli-units
PQ_SHIFT = 4096  # shift into non-negative ints (|x| ≤ 4 guaranteed)
PQ_TOPK = 3
PQ_QUERIES = 8  # ADC probes = vectors with vec_id < 8 (knn_batch rule)


def _pq_long(emb: DataFrame) -> DataFrame:
    """(vec_id, m, pos, xq): one row per vector component, quantized to
    shifted milli-units; m = subspace, pos = position inside it."""
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("idx", "x")
    ).select(
        "vec_id",
        F.expr(f"idx div {PQ_SUBDIM}").alias("m"),
        (F.col("idx") % PQ_SUBDIM).alias("pos"),
        (
            F.floor(F.col("x").cast("double") * PQ_MILLS + F.lit(0.5))
            + PQ_SHIFT
        ).alias("xq"),
    )


def _int_mean_centroids(assigned: DataFrame) -> DataFrame:
    """(m, j, pos, c): integer-mean codebook from (vec_id,m,pos,xq,j)."""
    return assigned.groupBy("m", "j", "pos").agg(
        F.expr("sum(xq) div count(1)").alias("c")
    )


def _nearest(long: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, m, j, d): nearest centroid per (vector, subspace) —
    int64 squared distance, ties to the smallest code index."""
    diff = F.col("xq") - F.col("c")
    d = (
        long.join(cents, ["m", "pos"])
        .groupBy("vec_id", "m", "j")
        # diff * diff, NOT diff ** 2: Spark pow() widens to DOUBLE
        .agg(F.sum(diff * diff).alias("d"))
    )
    return (
        d.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d", "j")).alias("best"))
        .select("vec_id", "m", F.col("best.j").alias("j"),
                F.col("best.d").alias("d"))
    )


def _pq_codebook(long: DataFrame) -> DataFrame:
    """Train the codebook: vec_id % K seed partition → integer-mean
    init centroids → one assignment round → integer-mean refit."""
    seeded = long.withColumn("j", F.col("vec_id") % PQ_K)
    c0 = _int_mean_centroids(seeded)
    assign1 = _nearest(long, c0).drop("d")
    refit = long.join(assign1, ["vec_id", "m"])
    return _int_mean_centroids(refit)


def pq_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Per-vector PQ code word + reconstruction error: every embedding
    compressed to Σ_m code_m · 16^m (one BIGINT, 4 bits per subspace)
    with recon_err = Σ_m min squared distance in (milli-unit)² — the
    audit that decides whether 8-byte codes are loss-acceptable
    corpus-wide (the embedding_quantization question, asked of PQ)."""
    long = _pq_long(load_table(spark, "embeddings", sf)).localCheckpoint()
    codes = _nearest(long, _pq_codebook(long))
    return codes.groupBy("vec_id").agg(
        F.sum(
            F.expr("shiftleft(CAST(j AS BIGINT), CAST(4 * m AS INT))")
        ).alias("pq_word"),
        F.sum("d").alias("recon_err"),
    )


def pq_adc_knn(spark: SparkSession, sf: str) -> DataFrame:
    """ADC top-k: for each of the first PQ_QUERIES vectors, the PQ_TOPK
    nearest non-self corpus vectors by asymmetric distance — the query
    subvector is compared against each subspace CODE, not each vector,
    so scoring a vector is M table lookups on its 8-nibble word.
    Distances in exact (milli-unit)² ints; ties break to the smaller
    vec_id."""
    long = _pq_long(load_table(spark, "embeddings", sf)).localCheckpoint()
    codebook = _pq_codebook(long)
    codes = _nearest(long, codebook).drop("d")
    # Q*M*K-row distance table: query subvector ↔ every code centroid
    dtab = (
        long.filter(F.col("vec_id") < PQ_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
        .join(codebook, ["m", "pos"])
        .groupBy("query_id", "m", "j")
        .agg(
            F.sum(
                (F.col("xq") - F.col("c")) * (F.col("xq") - F.col("c"))
            ).alias("d")
        )
    )
    adc = (
        codes.join(dtab, ["m", "j"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            "adc_dist",
        )
    )


# Shared oracle CTE chain: quantized long frame → codebook trained on
# ``train`` rows → codes for ``enc`` rows. CASTs pin DuckDB's HUGEINT
# sum-widening back to int64 so the arithmetic and type fingerprints
# match Spark exactly.
def _pq_sql_chain(train: str = "long", enc: str = "long") -> str:
    return f"""
long AS (
  SELECT vec_id,
         (u.idx - 1) // {PQ_SUBDIM} AS m,
         (u.idx - 1) % {PQ_SUBDIM} AS pos,
         CAST(floor(CAST(u.x AS DOUBLE) * {PQ_MILLS} + 0.5) AS BIGINT)
           + {PQ_SHIFT} AS xq
  FROM embeddings,
       LATERAL (SELECT generate_subscripts(embedding, 1) AS idx,
                       unnest(embedding) AS x) u
),
c0 AS (
  SELECT m, vec_id % {PQ_K} AS j, pos,
         CAST(sum(xq) // count(*) AS BIGINT) AS c
  FROM {train} GROUP BY m, vec_id % {PQ_K}, pos
),
d1 AS (
  SELECT l.vec_id, l.m, c.j,
         CAST(sum((l.xq - c.c) * (l.xq - c.c)) AS BIGINT) AS d
  FROM {train} l JOIN c0 c ON l.m = c.m AND l.pos = c.pos
  GROUP BY l.vec_id, l.m, c.j
),
a1 AS (
  SELECT vec_id, m, j
  FROM d1 QUALIFY row_number() OVER (PARTITION BY vec_id, m
                                     ORDER BY d, j) = 1
),
c1 AS (
  SELECT l.m, a.j, l.pos,
         CAST(sum(l.xq) // count(*) AS BIGINT) AS c
  FROM {train} l JOIN a1 a ON l.vec_id = a.vec_id AND l.m = a.m
  GROUP BY l.m, a.j, l.pos
),
d2 AS (
  SELECT l.vec_id, l.m, c.j,
         CAST(sum((l.xq - c.c) * (l.xq - c.c)) AS BIGINT) AS d
  FROM {enc} l JOIN c1 c ON l.m = c.m AND l.pos = c.pos
  GROUP BY l.vec_id, l.m, c.j
),
codes AS (
  SELECT vec_id, m, j, d
  FROM d2 QUALIFY row_number() OVER (PARTITION BY vec_id, m
                                     ORDER BY d, j) = 1
)"""


_PQ_BASE_SQL = _pq_sql_chain()


PQ_ENCODE_SQL = f"""
WITH {_PQ_BASE_SQL}
SELECT vec_id,
       CAST(sum(j << (4 * m)) AS BIGINT) AS pq_word,
       CAST(sum(d) AS BIGINT) AS recon_err
FROM codes GROUP BY vec_id
"""


PQ_ADC_KNN_SQL = f"""
WITH {_PQ_BASE_SQL},
dtab AS (
  SELECT l.vec_id AS query_id, l.m, c.j,
         CAST(sum((l.xq - c.c) * (l.xq - c.c)) AS BIGINT) AS d
  FROM long l JOIN c1 c ON l.m = c.m AND l.pos = c.pos
  WHERE l.vec_id < {PQ_QUERIES}
  GROUP BY l.vec_id, l.m, c.j
),
adc AS (
  SELECT t.query_id, k.vec_id, CAST(sum(t.d) AS BIGINT) AS adc_dist
  FROM codes k JOIN dtab t ON k.m = t.m AND k.j = t.j
  WHERE k.vec_id <> t.query_id
  GROUP BY t.query_id, k.vec_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_dist, vec_id) AS INT) AS rank,
       vec_id AS neighbor_id, adc_dist
FROM adc
QUALIFY rank <= {PQ_TOPK}
"""


# --- incremental encode against a frozen codebook ----------------------------

PQ_INC_MOD = 10  # vec_id % MOD == 0 → the increment; the rest is base


def pq_incremental_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Encode an INCREMENT batch against the codebook trained on the
    base corpus — the production shape of PQ maintenance (mirroring
    dedup_incremental_lsh): codebooks are trained once and frozen;
    arriving vectors are only ever encoded, never retrain the index.
    Each increment vector reports its code word, its reconstruction
    error under the FROZEN codebook (drift in this number over
    batches is the retrain signal), and how many base vectors share
    its exact code word — the free O(1) near-duplicate screen that
    8-byte codes buy (same-word = quantized-identical across all 8
    subspaces).

    Scale shape: training touches only base rows; the increment's
    encode join has the fixed 1024-row centroid build side, and the
    word-collision lookup is an equi-join against the (distinct word,
    count) table — bounded by the number of DISTINCT words ≤ 16^8,
    in practice ≪ corpus size.
    """
    long = _pq_long(load_table(spark, "embeddings", sf)).localCheckpoint()
    is_inc = F.col("vec_id") % PQ_INC_MOD == 0
    base_long, inc_long = long.filter(~is_inc), long.filter(is_inc)
    cb = _pq_codebook(base_long)

    def words(codes: DataFrame) -> DataFrame:
        return codes.groupBy("vec_id").agg(
            F.sum(
                F.expr("shiftleft(CAST(j AS BIGINT), CAST(4 * m AS INT))")
            ).alias("pq_word"),
            F.sum("d").alias("recon_err"),
        )

    base_words = (
        words(_nearest(base_long, cb))
        .groupBy("pq_word")
        .agg(F.count(F.lit(1)).alias("n_base_same_word"))
    )
    inc = words(_nearest(inc_long, cb))
    return inc.join(base_words, "pq_word", "left").select(
        "vec_id",
        "pq_word",
        "recon_err",
        F.coalesce("n_base_same_word", F.lit(0)).alias(
            "n_base_same_word"
        ),
    )


PQ_INCREMENTAL_SQL = f"""
WITH {_pq_sql_chain(
    train=f"(SELECT * FROM long WHERE vec_id % {PQ_INC_MOD} <> 0)",
    enc="long",
)},
words AS (
  SELECT vec_id,
         CAST(sum(j << (4 * m)) AS BIGINT) AS pq_word,
         CAST(sum(d) AS BIGINT) AS recon_err
  FROM codes GROUP BY vec_id
),
base_words AS (
  SELECT pq_word, count(*) AS n_base_same_word
  FROM words WHERE vec_id % {PQ_INC_MOD} <> 0 GROUP BY pq_word
)
SELECT w.vec_id, w.pq_word, w.recon_err,
       coalesce(b.n_base_same_word, 0) AS n_base_same_word
FROM words w LEFT JOIN base_words b ON w.pq_word = b.pq_word
WHERE w.vec_id % {PQ_INC_MOD} = 0
"""


PQ_QUERIES_REG = {
    "pq_encode": (pq_encode, PQ_ENCODE_SQL),
    "pq_adc_knn": (pq_adc_knn, PQ_ADC_KNN_SQL),
    "pq_incremental_encode": (pq_incremental_encode, PQ_INCREMENTAL_SQL),
}
