"""Corpus indexing & dataset-assembly plans over the documents table.

The retrieval/tokenizer side of a training-data pipeline (north-star
extensions per BASELINE.json; the reference's CLIP retrieval loop
``main.py:70-88`` is the 1-frame special case of the same
index-then-look-up shape):

- ``doc_chunking``    — overlapping token-window chunks (RAG ingest)
- ``inverted_index``  — capped per-token posting lists (search index)
- ``bpe_merge_step``  — adjacent-pair merge statistics (one BPE
                        tokenizer-training iteration)
- ``dataset_split``   — deterministic train/val/test hash split audit

Scale notes: chunking and the split are map-only (zero shuffle);
the index and BPE step shuffle on token/pair keys whose cardinality
is vocabulary-bounded (Zipf), not corpus-bounded, so map-side partial
aggregation absorbs the 100 TB fan-in. Posting lists are capped
BEFORE aggregation (rank filter, then collect) so no executor ever
materializes a hot token's full document list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens
from ..sources.tables import load_table
from .training_data import HASH_P

CHUNK_TOKENS = 32  # RAG window size
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks
POSTINGS_CAP = 8  # max doc ids kept per token
MERGE_TOP = 20  # BPE merges reported per step
# Independent Lehmer/MINSTD multiplier — deliberately NOT SHARD_MULT:
# sharing shard_assignment's multiplier made split bucket and shard
# congruent mod gcd(32, 100) = 4, skewing per-shard train shares to
# 88%/92% instead of 90% for any consumer stratifying by shard.
SPLIT_MULT = 48_271
SPLIT_ADD = 11


# --- RAG chunking ------------------------------------------------------------

def _chunk_rows(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Chunk relation with optional pass-through columns (``keep``) so
    consumers needing e.g. ``source`` stay map-only instead of
    re-joining documents afterwards."""
    toks = tokens(F.col("text"))
    n = F.size(F.col("toks"))
    n_chunks = 1 + F.ceil(
        F.greatest(n - CHUNK_TOKENS, F.lit(0)) / float(CHUNK_STRIDE)
    ).cast("long")
    return (
        docs.select(*keep, "doc_id", toks.alias("toks"))
        .select(
            *keep,
            "doc_id",
            "toks",
            F.posexplode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)),
        )
        .select(
            *keep,
            "doc_id",
            F.col("pos").alias("chunk_id"),
            (F.col("pos") * CHUNK_STRIDE).alias("start_tok"),
            F.least(
                F.lit(CHUNK_TOKENS).cast("long"),
                F.size(F.col("toks")) - F.col("pos") * CHUNK_STRIDE,
            ).alias("n_chunk_tokens"),
            F.array_join(
                F.slice(
                    F.col("toks"),
                    (F.col("pos") * CHUNK_STRIDE + 1).cast("int"),
                    CHUNK_TOKENS,
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """Split every document into CHUNK_TOKENS-token windows advancing by
    CHUNK_STRIDE (overlap = CHUNK − STRIDE), the standard RAG ingest
    shape. chunk k covers tokens [k·S, min(k·S+C, n)); the last window
    may be short but every token is covered exactly ⌈overlap-adjusted⌉
    times. Pure per-row array math + posexplode — zero shuffle; at
    100 TB this is an embarrassingly parallel scan whose output
    partitioning inherits the input's."""
    return _chunk_rows(load_table(spark, "documents", sf))


DOC_CHUNKING_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(trim(text), ' ') AS toks,
         len(string_split(trim(text), ' ')) AS n
  FROM documents
)
SELECT doc_id,
       unnest(range(0, 1 + CAST(ceil(greatest(n - {CHUNK_TOKENS}, 0)
                                     / {CHUNK_STRIDE}.0) AS BIGINT)))
         AS chunk_id,
       unnest(range(0, 1 + CAST(ceil(greatest(n - {CHUNK_TOKENS}, 0)
                                     / {CHUNK_STRIDE}.0) AS BIGINT)))
         * {CHUNK_STRIDE} AS start_tok,
       least({CHUNK_TOKENS},
             n - unnest(range(0, 1 + CAST(ceil(greatest(n - {CHUNK_TOKENS}, 0)
                                               / {CHUNK_STRIDE}.0) AS BIGINT)))
                 * {CHUNK_STRIDE}) AS n_chunk_tokens,
       array_to_string(
         list_slice(toks,
           unnest(range(0, 1 + CAST(ceil(greatest(n - {CHUNK_TOKENS}, 0)
                                         / {CHUNK_STRIDE}.0) AS BIGINT)))
             * {CHUNK_STRIDE} + 1,
           least(unnest(range(0, 1 + CAST(ceil(greatest(n - {CHUNK_TOKENS}, 0)
                                               / {CHUNK_STRIDE}.0) AS BIGINT)))
                   * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n)),
         ' ') AS chunk_text
FROM d
"""


# --- inverted index ----------------------------------------------------------

def inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Token → (document frequency, collection frequency, capped posting
    list). Postings keep the POSTINGS_CAP highest-tf docs (tf desc,
    doc_id asc) — the rank filter runs BEFORE collect_list, so the
    aggregated array is ≤cap elements even for stopword-grade tokens;
    df/cf still aggregate over ALL rows. Shuffle keys are (token,
    doc_id) then token — vocabulary-bounded, map-side combined.

    The posting list is emitted as a comma-joined STRING, not an array:
    the driver's canonicalizer sorts/hashes result cells with pandas,
    which cannot hash list cells (r5 driver err: "unhashable type:
    'list'"). Contract rule, pinned by tests/test_registry_contract.py:
    no registry query may output an array/map/struct-typed column."""
    docs = load_table(spark, "documents", sf)
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("tok").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    ranked = tf.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rk") <= POSTINGS_CAP,
                                F.struct(
                                    F.col("rk").alias("rk"),
                                    F.col("doc_id").alias("doc_id"),
                                ),
                            )
                        )
                    ),
                    lambda s: s.doc_id.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .select("tok", "df", "cf", "postings")
    )


INVERTED_INDEX_SQL = f"""
WITH tf AS (
  SELECT tok, doc_id, count(*) AS tf
  FROM (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
    FROM documents
  )
  GROUP BY tok, doc_id
), ranked AS (
  SELECT tok, doc_id, tf,
         row_number() OVER (PARTITION BY tok
                            ORDER BY tf DESC, doc_id ASC) AS rk
  FROM tf
)
SELECT tok,
       count(*) AS df,
       CAST(sum(tf) AS BIGINT) AS cf,
       array_to_string(
         list(doc_id ORDER BY rk ASC) FILTER (WHERE rk <= {POSTINGS_CAP}),
         ',') AS postings
FROM ranked
GROUP BY tok
"""


# --- one BPE training iteration ----------------------------------------------

def bpe_merge_step(spark: SparkSession, sf: str) -> DataFrame:
    """The inner statistic of BPE tokenizer training: corpus-weighted
    adjacent-symbol-pair frequencies at the character stage, reporting
    the MERGE_TOP pairs a trainer would merge next. Word frequencies
    aggregate first (vocab-bounded shuffle), so the pair explode runs
    over DISTINCT words — corpus size only enters through the counts.
    The final top-k window is a single partition over pair-vocabulary
    rows (bounded), after map-side partial aggregation."""
    docs = load_table(spark, "documents", sf)
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    pairs = wf.select(
        "wf",
        F.explode(
            F.when(
                F.length("w") >= 2,
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> concat(substr(w, i, 1), substr(w, i + 1, 1)))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
    )
    freq = pairs.groupBy("pair").agg(F.sum("wf").alias("pair_count"))
    w = Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    return (
        freq.select(
            F.row_number().over(w).alias("merge_rank"), "pair", "pair_count"
        )
        .filter(F.col("merge_rank") <= MERGE_TOP)
    )


BPE_MERGE_STEP_SQL = f"""
WITH wf AS (
  SELECT w, count(*) AS wf
  FROM (
    SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
  )
  GROUP BY w
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)),
                i -> substr(w, i, 1) || substr(w, i + 1, 1))) AS pair,
         wf
  FROM wf
  WHERE length(w) >= 2
), freq AS (
  SELECT pair, CAST(sum(wf) AS BIGINT) AS pair_count
  FROM pairs GROUP BY pair
)
SELECT merge_rank, pair, pair_count FROM (
  SELECT row_number() OVER (ORDER BY pair_count DESC, pair ASC)
           AS merge_rank,
         pair, pair_count
  FROM freq
) WHERE merge_rank <= {MERGE_TOP}
"""


# --- train/val/test split audit ----------------------------------------------

def split_col(doc_id: str = "doc_id"):
    """The canonical train/val/test assignment expression — mod-first
    (mult-first wraps int64 past doc_id ≈ 2.3e14, the repo hash
    convention), shared by the split audit and the leakage check so
    membership can never drift between them.

    TWO affine rounds, not one: every single-round affine hash of
    doc_id is congruent with shard_assignment's mod gcd(32, 100) = 4
    whenever the multipliers/adds share a residue class mod 4 (and
    partially correlated even when they don't, because the mod-HASH_P
    wrap counts of the two hashes track each other in doc_id). The
    second round makes the wrap count high-entropy in the first
    round's output, measured per-shard train shares 0.899-0.901 vs
    0.88/0.92 for the shared-multiplier version
    (tests/test_indexing.py::test_split_decorrelated_from_shard)."""
    r1 = ((F.col(doc_id) % HASH_P) * SPLIT_MULT + SPLIT_ADD) % HASH_P
    bucket = (r1 * SPLIT_MULT + SPLIT_ADD) % HASH_P % 100
    return (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )


_SPLIT_BUCKET_SQL = (
    f"((((doc_id % {HASH_P}) * {SPLIT_MULT} + {SPLIT_ADD}) % {HASH_P})"
    f" * {SPLIT_MULT} + {SPLIT_ADD}) % {HASH_P} % 100"
)
_SPLIT_CASE_SQL = f"""CASE
           WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'train'
           WHEN {_SPLIT_BUCKET_SQL} < 95 THEN 'val'
           ELSE 'test'
         END"""


def dataset_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by portable affine
    hash (split membership is lineage — engine hash() would not
    reproduce across engines or Spark versions), audited per
    (split, source): docs, tokens, and each split's doc share within
    its source. Assignment is map-only; the audit is one bounded-key
    shuffle with map-side partials."""
    docs = load_table(spark, "documents", sf)
    split = split_col()
    per = (
        docs.select(
            split.alias("split"), "source", token_count(F.col("text")).alias("n_tok")
        )
        .groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("tokens"))
    )
    src_total = Window.partitionBy("source")
    return per.select(
        "split",
        "source",
        "n_docs",
        "tokens",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(src_total), 6
        ).alias("doc_share"),
    )


DATASET_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT {_SPLIT_CASE_SQL} AS split,
         source,
         len(string_split(trim(text), ' ')) AS n_tok
  FROM documents
), per AS (
  SELECT split, source, count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS tokens
  FROM assigned GROUP BY split, source
)
SELECT split, source, n_docs, tokens,
       round(n_docs / sum(n_docs) OVER (PARTITION BY source), 6)
         AS doc_share
FROM per
"""


# --- chunk-level redundancy ---------------------------------------------------

def chunk_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Chunk-level duplication audit per source: how much of a RAG
    index built from doc_chunking would be redundant storage. Chunks
    fingerprint with SHA-256 (digest-only shuffle — chunk text never
    moves past the map side), distinct counts per source via one
    two-key agg; ``source`` rides the chunking map pass itself (no
    corpus-sized re-join back to documents). The overlap window means
    adjacent chunks of identical docs collide too, so dup_frac
    upper-bounds index savings."""
    chunks = _chunk_rows(
        load_table(spark, "documents", sf), keep=("source",)
    )
    per = (
        chunks.select("source", F.sha2(F.col("chunk_text"), 256).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("fp").alias("n_distinct"),
        )
    )
    return per.select(
        "source",
        "n_chunks",
        "n_distinct",
        F.round(1.0 - F.col("n_distinct") / F.col("n_chunks"), 6).alias(
            "dup_frac"
        ),
    )


CHUNK_DEDUP_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(trim(text), ' ') AS toks,
         len(string_split(trim(text), ' ')) AS n
  FROM documents
), chunks AS (
  SELECT doc_id,
         sha256(array_to_string(
           list_slice(toks,
             unnest(range(0, 1 + CAST(ceil(greatest(n - {CHUNK_TOKENS}, 0)
                                           / {CHUNK_STRIDE}.0) AS BIGINT)))
               * {CHUNK_STRIDE} + 1,
             least(unnest(range(0, 1 + CAST(ceil(greatest(n - {CHUNK_TOKENS}, 0)
                                                 / {CHUNK_STRIDE}.0) AS BIGINT)))
                     * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n)),
           ' ')) AS fp
  FROM d
), per AS (
  SELECT s.source, count(*) AS n_chunks, count(DISTINCT c.fp) AS n_distinct
  FROM chunks c JOIN documents s USING (doc_id)
  GROUP BY s.source
)
SELECT source, n_chunks, n_distinct,
       round(1.0 - n_distinct / CAST(n_chunks AS DOUBLE), 6) AS dup_frac
FROM per
"""


# --- train/test near-dup leakage ---------------------------------------------

def split_leakage_check(spark: SparkSession, sf: str) -> DataFrame:
    """Eval-integrity check: near-duplicate document pairs that
    STRADDLE dataset_split boundaries. A test doc whose near-twin sits
    in train leaks the benchmark; exact-hash decontamination misses
    these by construction. Output: canonical (split_a ≤ split_b) pair
    matrix with a leak flag — pairs are oriented by doc_id, which is
    independent of split, so the cell must canonicalize on the SPLIT
    values or train/test leaks would smear across two cells.

    The Spark side calls dedup_minhash_lsh itself (and the oracle its
    SQL twin), so a banding/threshold change there cannot desynchronize
    this check; the split join adds two bounded maps over the pair
    list."""
    from .dedup import dedup_minhash_lsh

    docs = load_table(spark, "documents", sf)
    pairs = dedup_minhash_lsh(spark, sf)
    sa = docs.select(F.col("doc_id").alias("ia"), split_col().alias("sp_a"))
    sb = docs.select(F.col("doc_id").alias("ib"), split_col().alias("sp_b"))
    return (
        pairs.join(sa, "ia")
        .join(sb, "ib")
        .select(
            F.least("sp_a", "sp_b").alias("split_a"),
            F.greatest("sp_a", "sp_b").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("is_leak", F.col("split_a") != F.col("split_b"))
    )


def _split_leakage_sql() -> str:
    from .dedup import _duck_minhash_sql

    lsh = _duck_minhash_sql()
    return f"""
WITH pairs AS ({lsh}),
sa AS (SELECT doc_id, {_SPLIT_CASE_SQL} AS split FROM documents),
sb AS (SELECT doc_id, {_SPLIT_CASE_SQL} AS split FROM documents)
SELECT least(sa.split, sb.split) AS split_a,
       greatest(sa.split, sb.split) AS split_b,
       count(*) AS n_pairs,
       least(sa.split, sb.split) <> greatest(sa.split, sb.split) AS is_leak
FROM pairs p
JOIN sa ON sa.doc_id = p.ia
JOIN sb ON sb.doc_id = p.ib
GROUP BY 1, 2
"""


# --- BM25 lexical retrieval --------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("table", "join", "window")  # fixed probe query
BM25_TOP = 10


def bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 top-k for a fixed probe query — the lexical half of
    hybrid retrieval (idf·tf saturation with length normalization;
    idf = ln((N−df+0.5)/(df+0.5)+1), k1/b at the standard 1.2/0.75).

    Scale shape: term frequencies filter to the QUERY'S terms before
    any shuffle (the scan feeds a |q|-term explode-filter, not a full
    posting build); df and the average doclen are broadcast scalars;
    the per-doc score sum shuffles only docs containing ≥1 query term.
    Deterministic top-k (score desc round-6, doc_id asc)."""
    # distributed top-k cut FIRST (TakeOrderedAndProject — per-partition
    # partial top-k, no global window over every matching doc), then
    # ranks attached over the ≤BM25_TOP surviving rows
    top = (
        _bm25_scored(spark, sf)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP)
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return top.select(F.row_number().over(w).alias("rank"), "doc_id", "bm25")


def _bm25_scored(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, bm25) for every doc containing ≥1 query term — the
    shared scorer behind bm25_topk, hybrid_rrf, and hard_negatives."""
    docs = load_table(spark, "documents", sf)
    q_terms = list(BM25_QUERY)
    base = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode("toks").alias("tok"),
    )
    n_total = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(token_count(F.col("text"))) / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        base.filter(F.col("tok").isin(q_terms))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
    )
    return scored


def _bm25_sql(top: int = BM25_TOP, rank_col: str = "rank") -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return f"""
SELECT row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS {rank_col},
       doc_id, bm25
FROM (
  SELECT tf.doc_id,
         round(sum(
           ln((t.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({BM25_K1} + 1))
           / (tf.tf + {BM25_K1}
              * (1 - {BM25_B} + {BM25_B} * tf.dl / t.avgdl))
         ), 6) AS bm25
  FROM (
    SELECT doc_id, dl, tok, count(*) AS tf FROM (
      SELECT doc_id, len(string_split(trim(text), ' ')) AS dl,
             unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    ) WHERE tok IN ({terms})
    GROUP BY doc_id, dl, tok
  ) tf
  JOIN (
    SELECT tok, count(*) AS df FROM (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
        FROM documents
      ) WHERE tok IN ({terms})
    ) GROUP BY tok
  ) df USING (tok)
  CROSS JOIN (
    SELECT count(*) AS n_docs,
           sum(len(string_split(trim(text), ' '))) / count(*) AS avgdl
    FROM documents
  ) t
  GROUP BY tf.doc_id
)
QUALIFY {rank_col} <= {top}
"""


BM25_TOPK_SQL = _bm25_sql()


# --- hybrid retrieval (reciprocal rank fusion) -------------------------------

RRF_K = 60


def hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion of the lexical (BM25 top-10) and vector
    (cosine kNN top-10 for probe vector 0) result lists:
    rrf = Σ_lists 1/(RRF_K + rank) — the standard hybrid-search merge
    (embeddings.vec_id aligns with documents.doc_id in the driver
    testdata; the fusion shape, not the id convention, is the point).
    Both input lists call the existing queries, so either ranker's
    semantics can never drift from its standalone form; fusing two
    ≤10-row lists is driver-trivial by design — the heavy lifting
    happened inside the rankers."""
    from .similarity import knn_bruteforce

    lex = bm25_topk(spark, sf).select(
        "doc_id", (1.0 / (RRF_K + F.col("rank"))).alias("lex_part")
    )
    knn = knn_bruteforce(spark, sf)
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    vec = knn.select(
        F.col("vec_id").alias("doc_id"),
        (1.0 / (RRF_K + F.row_number().over(w))).alias("vec_part"),
    )
    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce("lex_part", F.lit(0.0))
                + F.coalesce("vec_part", F.lit(0.0)),
                6,
            ).alias("rrf"),
            F.col("lex_part").isNotNull().alias("in_lexical"),
            F.col("vec_part").isNotNull().alias("in_vector"),
        )
    )
    wr = Window.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.select(F.row_number().over(wr).alias("rank"), "doc_id", "rrf",
                     "in_lexical", "in_vector")
        .filter(F.col("rank") <= BM25_TOP)
    )


def _hybrid_rrf_sql() -> str:
    from .similarity import KNN_BRUTEFORCE_SQL

    bm25 = _bm25_sql(rank_col="lex_rank")
    return f"""
WITH lex AS ({bm25}),
knn AS ({KNN_BRUTEFORCE_SQL}),
vec AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS vec_rank
  FROM knn
), fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         round(coalesce(1.0 / ({RRF_K} + l.lex_rank), 0)
               + coalesce(1.0 / ({RRF_K} + v.vec_rank), 0), 6) AS rrf,
         l.doc_id IS NOT NULL AS in_lexical,
         v.doc_id IS NOT NULL AS in_vector
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank,
       doc_id, rrf, in_lexical, in_vector
FROM fused
QUALIFY rank <= {BM25_TOP}
"""


# --- hard-negative mining (DPR-style) ----------------------------------------

HARDNEG_POOL = 50  # lexical candidate pool per query
HARDNEG_TOP = 10


def hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """DPR-style hard-negative mining for retriever training: documents
    that score HIGH lexically (BM25 pool of 50) for the probe query but
    are NOT semantic neighbours of the probe vector (absent from the
    cosine top-10) — the lexically-confusable, semantically-wrong
    examples contrastive training needs (in-batch random negatives are
    too easy; Karpukhin et al.'s recipe mines exactly this set).

    Plan: BM25 pool (same bounded shape as bm25_topk) anti-joined
    against the kNN list (≤10 rows, broadcast); everything downstream
    of the rankers is list-sized."""
    from .similarity import knn_bruteforce

    # distributed top-k pool cut (TakeOrderedAndProject), ranks over
    # the ≤HARDNEG_POOL survivors only; the probe's own document
    # (vec/doc 0) is excluded — it is by definition the most
    # semantically similar doc, the opposite of a negative
    pool = (
        _bm25_scored(spark, sf)
        .filter(F.col("doc_id") != 0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(HARDNEG_POOL)
    )
    pool_w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex = pool.select(
        "doc_id", "bm25", F.row_number().over(pool_w).alias("lex_rank")
    )
    vec = knn_bruteforce(spark, sf).select(F.col("vec_id").alias("doc_id"))
    out_w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        lex.join(F.broadcast(vec), "doc_id", "left_anti")
        .select(
            F.row_number().over(out_w).alias("neg_rank"), "doc_id", "bm25",
            "lex_rank",
        )
        .filter(F.col("neg_rank") <= HARDNEG_TOP)
    )


HARD_NEGATIVES_SQL = f"""
WITH lex_all AS ({_bm25_sql(top=10 ** 9, rank_col="raw_rank")}),
lex AS (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS lex_rank
  FROM lex_all WHERE doc_id <> 0
  QUALIFY lex_rank <= {HARDNEG_POOL}
),
knn AS ({{knn}}),
neg AS (
  SELECT l.doc_id, l.bm25, l.lex_rank
  FROM lex l ANTI JOIN knn k ON k.vec_id = l.doc_id
)
SELECT row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS neg_rank,
       doc_id, bm25, lex_rank
FROM neg
QUALIFY neg_rank <= {HARDNEG_TOP}
"""


# --- search snippets (keyword in context) ------------------------------------

SNIPPET_CTX = 3  # tokens of context each side of the first hit


def search_snippets(spark: SparkSession, sf: str) -> DataFrame:
    """Keyword-in-context extraction for the BM25 result list: for each
    hit, a ±SNIPPET_CTX-token window around the FIRST occurrence of
    any query term (earliest position wins) — the snippet a search /
    RAG result page shows. Pure array math on the ≤10 result docs:
    the result list broadcasts into a semi-join, so only hit docs ever
    compute snippets; everything else is pruned at the scan."""
    hits = bm25_topk(spark, sf)
    docs = load_table(spark, "documents", sf)
    toks = tokens(F.col("text"))
    first_pos = F.array_min(
        F.filter(
            F.array(
                *[F.array_position(F.col("toks"), t) for t in BM25_QUERY]
            ),
            lambda p: p > 0,
        )
    )
    start = F.greatest(F.lit(1).cast("long"), F.col("first_pos") - SNIPPET_CTX)
    return (
        docs.join(F.broadcast(hits), "doc_id")
        .select("doc_id", "rank", "bm25", toks.alias("toks"))
        .withColumn("first_pos", first_pos)
        .select(
            "rank",
            "doc_id",
            "bm25",
            "first_pos",
            F.array_join(
                F.slice(
                    F.col("toks"),
                    start.cast("int"),
                    2 * SNIPPET_CTX + 1,
                ),
                " ",
            ).alias("snippet"),
        )
    )


SEARCH_SNIPPETS_SQL = f"""
WITH hits AS ({BM25_TOPK_SQL}),
ctx AS (
  SELECT h.rank, h.doc_id, h.bm25,
         string_split(trim(d.text), ' ') AS toks,
         list_min(list_filter(
           [{', '.join(f"list_position(string_split(trim(d.text), ' '), '{t}')" for t in BM25_QUERY)}],
           p -> p > 0)) AS first_pos
  FROM hits h JOIN documents d USING (doc_id)
)
SELECT rank, doc_id, bm25, first_pos,
       array_to_string(
         list_slice(toks,
                    greatest(1, first_pos - {SNIPPET_CTX}),
                    least(len(toks),
                          greatest(1, first_pos - {SNIPPET_CTX})
                          + {2 * SNIPPET_CTX})),
         ' ') AS snippet
FROM ctx
"""


def _hard_negatives_sql() -> str:
    from .similarity import KNN_BRUTEFORCE_SQL

    return HARD_NEGATIVES_SQL.format(knn=KNN_BRUTEFORCE_SQL)


INDEXING_QUERIES = {
    "bm25_topk": (bm25_topk, BM25_TOPK_SQL),
    "hybrid_rrf": (hybrid_rrf, _hybrid_rrf_sql()),
    "hard_negatives": (hard_negatives, _hard_negatives_sql()),
    "search_snippets": (search_snippets, SEARCH_SNIPPETS_SQL),
    "chunk_dedup": (chunk_dedup, CHUNK_DEDUP_SQL),
    "split_leakage_check": (split_leakage_check, _split_leakage_sql()),
    "doc_chunking": (doc_chunking, DOC_CHUNKING_SQL),
    "inverted_index": (inverted_index, INVERTED_INDEX_SQL),
    "bpe_merge_step": (bpe_merge_step, BPE_MERGE_STEP_SQL),
    "dataset_split": (dataset_split, DATASET_SPLIT_SQL),
}
