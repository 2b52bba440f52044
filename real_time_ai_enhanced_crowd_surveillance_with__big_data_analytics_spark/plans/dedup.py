"""Deduplication plans over the documents table (north-star operators:
exact, n-gram Jaccard, MinHash+LSH, SimHash — BASELINE.json).

Hash design: every hash here is explicit portable arithmetic
(polynomial rolling hash, affine permutations mod p) rather than an
engine-native hash(), so the DuckDB oracle computes bit-identical
values — SURVEY.md §5.1's differential-testing requirement.

Scale posture:
- exact dedup: one shuffle on the text key (hash-groupBy).
- n-gram Jaccard: quadratic verify — kept as the correctness anchor.
- MinHash LSH: the 100 TB path — candidates come from band-key
  equality joins (shuffle on small band keys), never from the corpus
  square; verification touches only candidates.
- SimHash: constant-size signature per doc; pairing by signature
  distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

HASH_MOD = 1_000_000_007
HASH_BASE = 31
JACCARD_THRESHOLD = 0.2
N_PERMS = 16
MH_BAND_SIZE = 4  # 4 bands x 4 rows
SIMHASH_BITS = 32
SIMHASH_TOP = 20


# --- shared shingle machinery ------------------------------------------------

def _tokens(text):
    return F.split(F.trim(text), " ")


def _trigrams(tk):
    """Distinct token 3-gram strings (0-based Spark array indexing)."""
    n = F.size(tk)
    tri = F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(tk, i + 1), F.element_at(tk, i + 2), F.element_at(tk, i + 3)
        ),
    )
    return F.array_distinct(tri)


def _str_hash(col):
    """Polynomial hash of a string expr: fold (acc*31 + ascii) % p."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * HASH_BASE + c) % HASH_MOD,
    )


# DuckDB twins (1-based list indexing)
_DUCK_TOKENS = "string_split(trim(text), ' ')"
_DUCK_TRIGRAMS = (
    "list_distinct(list_transform(generate_series(1, len({tk}) - 2), "
    "i -> {tk}[CAST(i AS INT)] || ' ' || {tk}[CAST(i AS INT) + 1] "
    "|| ' ' || {tk}[CAST(i AS INT) + 2]))"
).format(tk=_DUCK_TOKENS)
_DUCK_STR_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({s}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    f"(acc, c) -> (acc * {HASH_BASE} + c) % {HASH_MOD})"
)


# --- exact dedup (hash-groupBy; SURVEY §2.3 J5 generalized) ------------------

def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact duplicate grouping: canonical id = min doc_id per identical
    text. The groupBy key is the text hash at scale (group on
    fingerprint, verify within group); here text itself — one shuffle."""
    docs = load_table(spark, "documents", sf)
    from pyspark.sql import Window

    w = Window.partitionBy("text")
    return docs.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count("*").over(w).alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )


DEDUP_EXACT_SQL = """
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY text) AS canonical_id,
       count(*) OVER (PARTITION BY text) AS group_size,
       doc_id = min(doc_id) OVER (PARTITION BY text) AS is_canonical
FROM documents
"""


# --- n-gram Jaccard near-dup (exact quadratic verify) ------------------------

def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """All document pairs with token-trigram Jaccard ≥ threshold —
    the exact near-dup answer. O(n²): correctness anchor for MinHash."""
    docs = load_table(spark, "documents", sf)
    tri = docs.select(
        "doc_id", _trigrams(_tokens(F.col("text"))).alias("tri")
    )
    a = tri.select(F.col("doc_id").alias("ia"), F.col("tri").alias("ta"))
    b = tri.select(F.col("doc_id").alias("ib"), F.col("tri").alias("tb"))
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    union = F.size(F.array_union(F.col("ta"), F.col("tb")))
    return (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH tri AS (
  SELECT doc_id, {_DUCK_TRIGRAMS} AS tri FROM documents
)
SELECT a.doc_id AS ia, b.doc_id AS ib,
       round(CAST(len(list_intersect(a.tri, b.tri)) AS DOUBLE)
             / len(list_distinct(list_concat(a.tri, b.tri))), 6) AS jaccard
FROM tri a JOIN tri b ON a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.tri, b.tri)) AS DOUBLE)
            / len(list_distinct(list_concat(a.tri, b.tri))), 6) >= {JACCARD_THRESHOLD}
"""


# --- MinHash + LSH (the scale path) ------------------------------------------

def _perm_params(j: int) -> tuple[int, int]:
    """Affine permutation j: x -> (a_j * x + b_j) % p, small odd a_j so
    products stay far from int64 overflow on either engine."""
    return 2 * j + 1, j * 12_345 + 7


def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash(16 perms) over trigram-shingle hashes, banded 4×4; pairs
    sharing a band key are candidates; exact trigram Jaccard verifies.
    Identical output semantics to dedup_ngram_jaccard minus LSH recall
    loss; cost is bounded by candidates, not the corpus square."""
    docs = load_table(spark, "documents", sf)
    tri = docs.select("doc_id", _trigrams(_tokens(F.col("text"))).alias("tri"))
    sids = tri.select(
        "doc_id",
        "tri",
        F.transform(F.col("tri"), lambda s: _str_hash(s)).alias("sids"),
    )
    def _perm(a: int, b: int):
        # single-arg closure: PySpark counts lambda params to decide the
        # higher-order-function arity, so no default-arg tricks here
        return lambda x: (a * x + b) % HASH_MOD

    mh_cols = []
    for j in range(N_PERMS):
        a, b = _perm_params(j)
        mh_cols.append(
            F.array_min(F.transform(F.col("sids"), _perm(a, b))).alias(f"mh{j}")
        )
    sigs = sids.select("doc_id", "tri", *mh_cols)
    band_rows = []
    for band in range(N_PERMS // MH_BAND_SIZE):
        key = F.concat_ws(
            ":",
            *[F.col(f"mh{band * MH_BAND_SIZE + r}") for r in range(MH_BAND_SIZE)],
        )
        band_rows.append(
            sigs.select("doc_id", F.lit(band).alias("band"), key.alias("band_key"))
        )
    bands = band_rows[0]
    for br in band_rows[1:]:
        bands = bands.unionAll(br)
    a = bands.select(F.col("doc_id").alias("ia"), "band", F.col("band_key").alias("ka"))
    b = bands.select(
        F.col("doc_id").alias("ib"), F.col("band").alias("bandb"), F.col("band_key").alias("kb")
    )
    cands = (
        a.join(
            b,
            (F.col("band") == F.col("bandb"))
            & (F.col("ka") == F.col("kb"))
            & (F.col("ia") < F.col("ib")),
        )
        .select("ia", "ib")
        .distinct()
    )
    ta = tri.select(F.col("doc_id").alias("ia"), F.col("tri").alias("ta"))
    tb = tri.select(F.col("doc_id").alias("ib"), F.col("tri").alias("tb"))
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    union = F.size(F.array_union(F.col("ta"), F.col("tb")))
    return (
        cands.join(ta, "ia")
        .join(tb, "ib")
        .select(
            "ia",
            "ib",
            F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _duck_minhash_sql() -> str:
    mh_exprs = []
    for j in range(N_PERMS):
        a, b = _perm_params(j)
        mh_exprs.append(
            f"list_min(list_transform(sids, x -> (x * {a} + {b}) % {HASH_MOD})) AS mh{j}"
        )
    band_selects = []
    for band in range(N_PERMS // MH_BAND_SIZE):
        cols = " || ':' || ".join(
            f"CAST(mh{band * MH_BAND_SIZE + r} AS VARCHAR)" for r in range(MH_BAND_SIZE)
        )
        band_selects.append(
            f"SELECT doc_id, {band} AS band, {cols} AS band_key FROM sigs"
        )
    bands_union = " UNION ALL ".join(band_selects)
    shash = _DUCK_STR_HASH.format(s="s")
    return f"""
WITH tri AS (
  SELECT doc_id, {_DUCK_TRIGRAMS} AS tri FROM documents
), sids AS (
  SELECT doc_id, tri,
         list_transform(tri, s -> {shash}) AS sids
  FROM tri
), sigs AS (
  SELECT doc_id, tri, {', '.join(mh_exprs)} FROM sids
), bands AS (
  {bands_union}
), cands AS (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.ia, c.ib,
       round(CAST(len(list_intersect(ta.tri, tb.tri)) AS DOUBLE)
             / len(list_distinct(list_concat(ta.tri, tb.tri))), 6) AS jaccard
FROM cands c
JOIN tri ta ON ta.doc_id = c.ia
JOIN tri tb ON tb.doc_id = c.ib
WHERE round(CAST(len(list_intersect(ta.tri, tb.tri)) AS DOUBLE)
            / len(list_distinct(list_concat(ta.tri, tb.tri))), 6) >= {JACCARD_THRESHOLD}
"""


# --- SimHash ------------------------------------------------------------------

def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """32-bit SimHash per doc (token-frequency-weighted sign sums), then
    the top-20 closest pairs by Hamming distance. Signature build is
    relational (explode bits → conditional sum → bit pack) so both
    engines compute identical signatures."""
    docs = load_table(spark, "documents", sf)
    th = docs.select(
        "doc_id",
        F.explode(
            F.transform(_tokens(F.col("text")), lambda t: _str_hash(t))
        ).alias("th"),
    )
    bits = (
        th.crossJoin(
            F.broadcast(
                docs.sparkSession.range(SIMHASH_BITS).select(
                    F.col("id").cast("int").alias("i")
                )
            )
        )
        .groupBy("doc_id", "i")
        .agg(
            F.sum(
                F.when(F.expr("(th >> i) & 1 = 1"), 1).otherwise(-1)
            ).alias("w")
        )
    )
    sigs = bits.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("w") > 0, F.expr(f"CAST(1 AS BIGINT) << i")).otherwise(0)
        ).alias("simhash")
    )
    a = sigs.select(F.col("doc_id").alias("ia"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("ib"), F.col("simhash").alias("sb"))
    return (
        a.join(b, F.col("ia") < F.col("ib"))
        .select("ia", "ib", F.expr("bit_count(sa ^ sb)").alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc("ia"), F.asc("ib"))
        .limit(SIMHASH_TOP)
    )


_DUCK_TOKEN_HASH = _DUCK_STR_HASH.format(s="t")

DEDUP_SIMHASH_SQL = f"""
WITH th AS (
  SELECT doc_id,
         unnest(list_transform({_DUCK_TOKENS}, t -> {_DUCK_TOKEN_HASH})) AS th
  FROM documents
), bits AS (
  SELECT doc_id, i,
         sum(CASE WHEN (th >> i) & 1 = 1 THEN 1 ELSE -1 END) AS w
  FROM th CROSS JOIN generate_series(0, {SIMHASH_BITS - 1}) t(i)
  GROUP BY doc_id, i
), sigs AS (
  SELECT doc_id,
         sum(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS ia, b.doc_id AS ib,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
ORDER BY hamming ASC, ia ASC, ib ASC
LIMIT {SIMHASH_TOP}
"""


DEDUP_QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, _duck_minhash_sql()),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
}
