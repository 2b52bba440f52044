"""Training-data pipeline operators over documents/embeddings — the
ops a 100 TB LLM-pretraining corpus build needs beyond dedup/quality
(BASELINE.json "north_star"; complements plans/dedup.py,
plans/pipeline_quality.py, plans/text.py).

- sequence packing: concat-and-chunk documents into fixed token-budget
  training sequences (the standard pretraining packing strategy),
  fully relational — a cumulative-sum window plus an interval explode,
  no UDF, no driver loop.
- per-source quota sampling: deterministic hash-priority top-K per
  source (corpus mixing / domain capping).
- shard assignment: portable-hash sharding with a balance audit —
  the "write N training shards" step, verified skew-free.
- embedding quantization: int8 symmetric quantization error audit per
  vector (storage-halving decision data).

All four are oracle-checked against DuckDB on identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..functions.text import DUCK_QUALITY

_DQ = DUCK_QUALITY.format(text="text")

SEQ_LEN = 256          # token budget per packed sequence
QUOTA_PER_SOURCE = 50  # domain cap for quota sampling
N_SHARDS = 32
HASH_P = 1_000_000_007
PRIORITY_MULT = 2_654_435_761  # Knuth multiplicative hash constant
# Selection-ORDER hash (cap/quota/budget ranking) — two affine rounds
# with a multiplier independent of BOTH the quality-sample coin
# (PRIORITY_MULT) and the train/val/test split hash (48_271,
# indexing.py). Sharing the coin's hash made "quality-sample then
# cap" compositions quality-biased: inside the cap's low-priority
# window priority < KEEP_SCALE means coin == priority, so the cap's
# keep-order and the sampler's acceptance stop being independent
# (measured: capped-sample mean quality 0.7580 shared vs 0.7631
# independent on 2M uniform-quality docs —
# tests/test_training_data.py::test_selection_order_decorrelated).
# The selection ops deliberately share THIS hash with each other:
# equal priorities across cap/quota/budget give nested, reproducible
# subsets (the 10k sample is a prefix of the 50k sample).
SELECT_MULT = 69_621
SELECT_ADD = 17


def _sel_priority() -> F.Column:
    """Two-round selection-order hash of doc_id (mod-first each round:
    1e9 x 69_621 stays far under int64)."""
    r1 = ((F.col("doc_id") % HASH_P) * SELECT_MULT + SELECT_ADD) % HASH_P
    return (r1 * SELECT_MULT + SELECT_ADD) % HASH_P


_SEL_PRIORITY_SQL = (
    f"((((doc_id % {HASH_P}) * {SELECT_MULT} + {SELECT_ADD}) % {HASH_P})"
    f" * {SELECT_MULT} + {SELECT_ADD}) % {HASH_P}"
)
SHARD_MULT = 40_503  # shard multiplier — indexing.py's split hash is
# DELIBERATELY independent (two-round 48_271): sharing this constant made
# split buckets congruent with shards mod 4 (see test_split_decorrelated_from_shard)


def _n_tokens() -> F.Column:
    return F.size(F.split(F.trim(F.col("text")), " "))


# --- sequence packing (concat-and-chunk) -------------------------------------

def sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Pack documents into SEQ_LEN-token training sequences per source:
    documents concatenate in doc_id order and chunk at exact token
    boundaries, so a document straddling a boundary contributes a row
    to each sequence it overlaps (seq_id, tokens contributed,
    is_split flag).

    Spark shape: the running token total is one window over
    (source, doc_id) — partitioned by source, so at 100 TB every
    partition packs independently (packing across the whole corpus
    would serialize into one task; per-source is also what mixing
    weights want). The overlap rows come from exploding
    ``sequence(first_seq, last_seq)`` — interval arithmetic, no UDF.
    """
    docs = load_table(spark, "documents", sf)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        "source", "doc_id", _n_tokens().alias("n_tok")
    ).withColumn("cum", F.sum("n_tok").over(w))
    spans = sized.select(
        "source",
        "doc_id",
        "n_tok",
        (F.col("cum") - F.col("n_tok")).alias("start"),
        F.col("cum").alias("end"),
        F.floor((F.col("cum") - F.col("n_tok")) / SEQ_LEN).alias("first_seq"),
        F.floor((F.col("cum") - 1) / SEQ_LEN).alias("last_seq"),
    )
    return spans.select(
        "source",
        "doc_id",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
        "start",
        "end",
        (F.col("first_seq") != F.col("last_seq")).alias("is_split"),
    ).select(
        "source",
        "doc_id",
        "seq_id",
        (
            F.least(F.col("end"), (F.col("seq_id") + 1) * SEQ_LEN)
            - F.greatest(F.col("start"), F.col("seq_id") * SEQ_LEN)
        ).alias("n_tok_in_seq"),
        "is_split",
    )


SEQUENCE_PACKING_SQL = f"""
WITH sized AS (
  SELECT source, doc_id,
         len(string_split(trim(text), ' ')) AS n_tok,
         CAST(sum(len(string_split(trim(text), ' ')))
           OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM documents
), spans AS (
  SELECT source, doc_id, n_tok, cum - n_tok AS start_tok, cum AS end_tok,
         CAST(floor((cum - n_tok) / {SEQ_LEN}) AS BIGINT) AS first_seq,
         CAST(floor((cum - 1) / {SEQ_LEN}) AS BIGINT) AS last_seq
  FROM sized
), exploded AS (
  SELECT source, doc_id, start_tok, end_tok, first_seq, last_seq,
         unnest(generate_series(first_seq, last_seq)) AS seq_id
  FROM spans
)
SELECT source, doc_id, seq_id,
       least(end_tok, (seq_id + 1) * {SEQ_LEN})
         - greatest(start_tok, seq_id * {SEQ_LEN}) AS n_tok_in_seq,
       first_seq <> last_seq AS is_split
FROM exploded
"""


# --- per-source quota sampling -----------------------------------------------

def source_quota_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic domain capping: keep at most QUOTA_PER_SOURCE
    documents per source, chosen by a multiplicative-hash priority
    (uniform, seedless-reproducible — reruns pick identical rows,
    unlike sample()). One window shuffle keyed by source; the rank
    predicate prunes inside the window operator, so only K rows per
    source survive the exchange at 100 TB (rank pushdown)."""
    docs = load_table(spark, "documents", sf)
    priority = _sel_priority()
    w = Window.partitionBy("source").orderBy(priority.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", priority.alias("priority"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QUOTA_PER_SOURCE)
        .select("doc_id", "source", "rk")
    )


SOURCE_QUOTA_SAMPLE_SQL = f"""
SELECT doc_id, source, rk
FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_SEL_PRIORITY_SQL} ASC,
                                     doc_id ASC) AS rk
  FROM documents
)
WHERE rk <= {QUOTA_PER_SOURCE}
"""


# --- shard assignment + balance audit ----------------------------------------

def shard_assignment(spark: SparkSession, sf: str) -> DataFrame:
    """Hash documents into N_SHARDS training shards and audit balance:
    per-shard doc count, token sum, and each shard's deviation from the
    mean token load. The portable affine hash (not engine hash()) keeps
    the assignment reproducible across engines and runs — shard
    membership IS training data lineage. At 100 TB this is the
    ``repartition(N, shard).write`` layout step; the audit aggregate is
    a map-side-combined single shuffle of N rows."""
    docs = load_table(spark, "documents", sf)
    # mod-first: (doc_id % P) * MULT stays under int64 for any doc_id;
    # mult-first overflows (and wraps negative) past doc_id ≈ 2.3e14
    shard = (
        (F.col("doc_id") % HASH_P) * SHARD_MULT + 7
    ) % HASH_P % N_SHARDS
    per_shard = (
        docs.select(shard.alias("shard"), _n_tokens().alias("n_tok"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("tokens"))
        # materialize ONCE (N_SHARDS rows): both the mean branch and
        # the output read this, and without it the crossJoin re-runs
        # the corpus scan+shuffle per branch (no ReusedExchange across
        # DataFrame branches). eager=False defers the checkpoint job to
        # first execution, so building the plan (bench registration,
        # explain audits) stays side-effect-free. The mean then rides
        # as a 1-row broadcast, not a global window — an un-partitioned
        # window would funnel the frame through a SinglePartition
        # exchange (the shape tools/explain_audit.py flags).
        .localCheckpoint(eager=False)
    )
    mean_tokens = per_shard.agg(
        F.avg("tokens").alias("_mean_tokens")
    )
    return per_shard.crossJoin(F.broadcast(mean_tokens)).select(
        "shard",
        "n_docs",
        "tokens",
        F.round(F.col("tokens") / F.col("_mean_tokens"), 6).alias("load_ratio"),
    )


SHARD_ASSIGNMENT_SQL = f"""
WITH per_shard AS (
  SELECT (((doc_id % {HASH_P}) * {SHARD_MULT} + 7) % {HASH_P}) % {N_SHARDS} AS shard,
         count(*) AS n_docs,
         CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS tokens
  FROM documents
  GROUP BY 1
)
SELECT shard, n_docs, tokens,
       round(tokens / avg(tokens) OVER (), 6) AS load_ratio
FROM per_shard
"""


# --- int8 embedding quantization audit ---------------------------------------

def embedding_quantization(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 quantization audit per embedding: scale =
    max|x|/127, q_i = floor(x_i/scale + 0.5) (explicit half-up — both
    engines' round() tie-break the same way only on this form), error =
    max_i |q_i*scale − x_i|. Output decides whether int8 storage is
    loss-acceptable corpus-wide.

    Array folds stay in Column higher-order functions — fine at this
    dimension (64); the bulk path for re-encoding payloads at 100 TB is
    the vectorized mapInPandas matmul pattern (plans/similarity.py).
    """
    emb = load_table(spark, "embeddings", sf)
    x = F.col("embedding")
    amax = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    scale = F.greatest(amax, F.lit(1e-12)) / 127.0
    quant = F.transform(
        x, lambda v: F.floor(v.cast("double") / F.col("scale") + 0.5)
    )
    err = F.array_max(
        F.zip_with(
            F.col("q"),
            x,
            lambda qi, xi: F.abs(qi * F.col("scale") - xi.cast("double")),
        )
    )
    return (
        emb.select("vec_id", "label", "embedding", scale.alias("scale"))
        .withColumn("q", quant)
        .select(
            "vec_id",
            "label",
            F.round(F.col("scale"), 6).alias("scale_r"),
            F.round(err, 6).alias("max_abs_err"),
            F.aggregate(
                F.col("q"),
                F.lit(0).cast("long"),
                lambda acc, qi: acc + F.abs(qi).cast("long"),
            ).alias("q_l1"),
        )
    )


EMBEDDING_QUANTIZATION_SQL = """
WITH scaled AS (
  SELECT vec_id, label, embedding,
         greatest(list_max(list_transform(embedding,
                                          v -> abs(CAST(v AS DOUBLE)))),
                  1e-12) / 127.0 AS scale
  FROM embeddings
), quantized AS (
  SELECT vec_id, label, embedding, scale,
         list_transform(embedding,
                        v -> floor(CAST(v AS DOUBLE) / scale + 0.5)) AS q
  FROM scaled
)
SELECT vec_id, label,
       round(scale, 6) AS scale_r,
       round(list_max(list_transform(list_zip(q, embedding),
             p -> abs(p[1] * scale - CAST(p[2] AS DOUBLE)))), 6)
         AS max_abs_err,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(q, v -> CAST(abs(v) AS BIGINT))),
                   (acc, v) -> acc + v) AS q_l1
FROM quantized
"""


# --- token-budget mixture sampling -------------------------------------------

TOKEN_BUDGET = 2000  # per-source token budget for the training mixture


def token_budget_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture construction by token budget: per source, admit documents
    in hash-priority order until the source's cumulative token count
    reaches TOKEN_BUDGET (the first overflowing doc is admitted, so
    every source with data contributes ≥1 doc and the budget is a
    floor — matching greedy mixture builders).

    Same single-window shape as source_quota_sample but the admission
    predicate rides a running sum, not a rank: cum_before < budget.
    At 100 TB per-source budgets replace global proportional sampling
    precisely because each source windows independently."""
    docs = load_table(spark, "documents", sf)
    priority = _sel_priority()
    w = (
        Window.partitionBy("source")
        .orderBy(priority.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        "doc_id", "source", _n_tokens().alias("n_tok"), priority.alias("priority")
    ).withColumn("cum", F.sum("n_tok").over(w))
    return (
        sized.filter(F.col("cum") - F.col("n_tok") < TOKEN_BUDGET)
        .select("doc_id", "source", "n_tok", (F.col("cum") - F.col("n_tok")).alias("cum_before"))
    )


TOKEN_BUDGET_SAMPLE_SQL = f"""
WITH sized AS (
  SELECT doc_id, source,
         len(string_split(trim(text), ' ')) AS n_tok,
         CAST(sum(len(string_split(trim(text), ' ')))
           OVER (PARTITION BY source
                 ORDER BY {_SEL_PRIORITY_SQL} ASC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM documents
)
SELECT doc_id, source, n_tok, cum - n_tok AS cum_before
FROM sized
WHERE cum - n_tok < {TOKEN_BUDGET}
"""


# --- quality-weighted resampling (DCLM/FineWeb-style) ------------------------

KEEP_SCALE = 1_000_000    # integer-scaled threshold for exact parity


def quality_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic quality-weighted document resampling: keep a
    document iff its multiplicative-hash coin lands under quality² —
    the probability-proportional-to-quality sampler
    used to upweight high-quality strata in pretraining mixtures. The
    squaring temperature is FIXED at 2 and written as an explicit
    product in both engines (see the in-plan comment); a configurable
    exponent would reintroduce the cross-engine pow() hazard.

    Scale shape: a pure per-row filter — ZERO shuffles, no window, no
    join; at 100 TB this is a map-only pass the scan pushes through.
    Determinism (hash coin, not rand()) makes the sample reproducible
    and oracle-checkable; the keep threshold is integer-scaled so both
    engines compare exact integers, never raw doubles.
    """
    from ..functions.text import quality_score

    docs = load_table(spark, "documents", sf)
    coin = (F.col("doc_id") % HASH_P) * PRIORITY_MULT % HASH_P % KEEP_SCALE  # mod-first: overflow-free
    # quality^2 as an explicit product, NOT pow(): both engines round
    # quality to 6 decimals first, so the product of those identical
    # doubles is IEEE-identical, whereas libm pow() may differ by 1 ulp
    # across engines and flip the round() at a .5 boundary (ADVICE r3)
    q = quality_score(F.col("text"))
    thresh = F.round(q * q * KEEP_SCALE, 0).cast("long")
    return (
        docs.select(
            "doc_id",
            "source",
            quality_score(F.col("text")).alias("quality"),
            coin.alias("coin"),
            thresh.alias("keep_below"),
        )
        .filter(F.col("coin") < F.col("keep_below"))
    )


QUALITY_WEIGHTED_SAMPLE_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
         {_DQ} AS quality,
         (doc_id % {HASH_P}) * {PRIORITY_MULT} % {HASH_P} % {KEEP_SCALE} AS coin
  FROM documents
)
SELECT doc_id, source, quality, coin,
       CAST(round(quality * quality * {KEEP_SCALE}, 0) AS BIGINT)
         AS keep_below
FROM scored
WHERE coin < CAST(round(quality * quality * {KEEP_SCALE}, 0) AS BIGINT)
"""


# --- epoch upsampling (quality-banded replication + training order) ----------

EPOCH_HI_E6, EPOCH_HI_COPIES = 800_000, 3
EPOCH_MID_E6, EPOCH_MID_COPIES = 500_000, 2


def epoch_upsample(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-banded epoch replication: EMIT each document 1–3 times
    (quality ≥ 0.8 → 3 copies, ≥ 0.5 → 2, else 1) with a copy index
    and a deterministic pseudorandom training-order key — the mixture
    lever ``quality_weighted_sample`` (selection) cannot express:
    "N epochs of the high-quality stratum per epoch of the tail" is
    how published mixtures upweight curated sources, and the packer
    downstream needs the replicas as ROWS, not as weights.

    Determinism end-to-end: bands compare the integer-scaled quality
    (``round(q·1e6)`` of the already-6dp-rounded score — no raw-double
    threshold), copies explode a sequence, and the order key is ONE
    multiplicative hash of the injective combined key
    ``(doc_id·1000 + copy_idx)`` — one wide hash, not two composed
    congruential maps, which scatter on a torus lattice (the
    spatial-sites spectral-test lesson). Replicas of the same doc land
    far apart in key space, which is exactly what epoch interleaving
    wants.

    Scale shape: map-only — a per-row band projection + a ≤3× explode,
    ZERO shuffles; ordering by the key is the consumer's shard-local
    sort (shard by key range, sort within shard — never a global sort).
    """
    from ..functions.text import quality_score

    docs = load_table(spark, "documents", sf)
    q = quality_score(F.col("text"))
    q_e6 = F.round(q * 1_000_000, 0).cast("long")
    n_copies = (
        F.when(q_e6 >= EPOCH_HI_E6, EPOCH_HI_COPIES)
        .when(q_e6 >= EPOCH_MID_E6, EPOCH_MID_COPIES)
        .otherwise(1)
    )
    base = docs.select(
        "doc_id", q_e6.alias("q_e6"), n_copies.alias("n_copies")
    )
    combined = (F.col("doc_id") % HASH_P) * 1000 + F.col("copy_idx")
    return base.select(
        "doc_id",
        "q_e6",
        "n_copies",
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
    ).select(
        "doc_id",
        "q_e6",
        "n_copies",
        "copy_idx",
        (combined % HASH_P * PRIORITY_MULT % HASH_P).alias("shuffle_key"),
    )


EPOCH_UPSAMPLE_SQL = f"""
WITH scored AS (
  SELECT doc_id,
         CAST(round({_DQ} * 1000000, 0) AS BIGINT) AS q_e6
  FROM documents
), banded AS (
  SELECT doc_id, q_e6,
         CASE WHEN q_e6 >= {EPOCH_HI_E6} THEN {EPOCH_HI_COPIES}
              WHEN q_e6 >= {EPOCH_MID_E6} THEN {EPOCH_MID_COPIES}
              ELSE 1 END AS n_copies
  FROM scored
)
SELECT doc_id, q_e6, CAST(n_copies AS INT) AS n_copies,
       CAST(copy_idx AS INT) AS copy_idx,
       ((doc_id % {HASH_P}) * 1000 + copy_idx) % {HASH_P}
         * {PRIORITY_MULT} % {HASH_P} AS shuffle_key
FROM banded, unnest(generate_series(1, n_copies)) AS t(copy_idx)
"""


# --- span corruption (T5-style denoising mask construction) ------------------

SPAN_LEN = 3          # corrupted-span length (T5's mean span length)
SPAN_RATE_MOD = 7     # 1-in-7 aligned slots corrupt ≈ 14% token rate


def span_corruption(spark: SparkSession, sf: str) -> DataFrame:
    """T5-style span-corruption mask construction (Raffel et al. 2020
    §3.1.4: replace ~15% of tokens in short spans with sentinels):
    emit one row per corrupted span — (doc_id, mask_id, span_start,
    span_len) — plus the document's realized corruption rate, the
    training-pair build step between cleaning and packing.

    Deterministic aligned-grid spec (the oracle IS the definition):
    token positions chunk into aligned length-{L} slots (slot s covers
    positions s·{L}..s·{L}+{L}−1), and slot s of document d corrupts
    iff ``hash(d·10007 + s) % {M} == 0`` under the selection-order
    multiplicative hash — aligned slots make spans NON-OVERLAPPING by
    construction (T5's sequential non-overlap sampling is stateful and
    engine-hostile; grid alignment buys the same guarantee
    relationally). The final partial slot corrupts truncated
    (span_len = n − start), keeping the realized rate exact.

    Scale: one explode over slots (|tokens|/{L} rows per doc) + a
    doc-keyed aggregate for the rate — map-side combinable, no joins,
    vocabulary-independent.
    """
    docs = load_table(spark, "documents", sf)
    n_tok = _n_tokens()
    n_slots = F.ceil(n_tok / F.lit(SPAN_LEN)).cast("int")
    slots = docs.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.explode(F.sequence(F.lit(0), n_slots - 1)).alias("slot"),
    )
    h = (
        (F.col("doc_id") * 10007 + F.col("slot")) % HASH_P
    ) * SELECT_MULT % HASH_P
    picked = slots.filter(h % SPAN_RATE_MOD == 0).select(
        "doc_id",
        "n_tok",
        "slot",
        (F.col("slot") * SPAN_LEN).alias("span_start"),
        F.least(
            F.lit(SPAN_LEN), F.col("n_tok") - F.col("slot") * SPAN_LEN
        ).alias("span_len"),
    )
    w = Window.partitionBy("doc_id").orderBy("slot")
    rate = Window.partitionBy("doc_id")
    return picked.select(
        "doc_id",
        (F.row_number().over(w) - 1).alias("mask_id"),
        "span_start",
        "span_len",
        F.expr(
            "(1000000 * sum(span_len) OVER (PARTITION BY doc_id))"
            " DIV first(n_tok) OVER (PARTITION BY doc_id)"
        ).alias("corrupt_rate_e6"),
    )


if span_corruption.__doc__:  # absent under python -OO
    span_corruption.__doc__ = span_corruption.__doc__.format(
        L=SPAN_LEN, M=SPAN_RATE_MOD
    )


SPAN_CORRUPTION_SQL = f"""
WITH sized AS (
  SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tok
  FROM documents
), slots AS (
  SELECT doc_id, n_tok,
         unnest(generate_series(0,
           CAST(ceil(n_tok / {SPAN_LEN}.0) AS INT) - 1)) AS slot
  FROM sized
), picked AS (
  SELECT doc_id, n_tok, slot,
         slot * {SPAN_LEN} AS span_start,
         least({SPAN_LEN}, n_tok - slot * {SPAN_LEN}) AS span_len
  FROM slots
  WHERE ((doc_id * 10007 + slot) % {HASH_P}) * {SELECT_MULT} % {HASH_P}
        % {SPAN_RATE_MOD} = 0
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY slot) - 1
            AS BIGINT) AS mask_id,
       CAST(span_start AS BIGINT) AS span_start,
       CAST(span_len AS BIGINT) AS span_len,
       (1000000 * CAST(sum(span_len) OVER (PARTITION BY doc_id) AS BIGINT))
         // n_tok AS corrupt_rate_e6
FROM picked
"""


# --- source mixture report (the dataset card) --------------------------------

def source_mixture_report(spark: SparkSession, sf: str) -> DataFrame:
    """Per (source, lang) corpus composition: document count, token
    total, mean quality, and each cell's share of corpus tokens — the
    dataset-card summary published next to every training mixture.
    One groupBy plus a broadcast 1-row corpus total — NOT a global
    window: at web scale ``source`` is domain-cardinality (millions),
    so an un-partitioned window over the aggregated frame would still
    funnel millions of rows through one SinglePartition exchange
    (tools/explain_audit.py flags exactly that shape); the keyless
    aggregate + broadcast crossJoin keeps the share computation
    embarrassingly parallel."""
    from ..functions.text import quality_score, token_count

    docs = load_table(spark, "documents", sf)
    # mean quality via integer-exact micro-units (tools/
    # round_margin_audit.py measured the float avg EXACTLY on a 6dp
    # rounding midpoint — margin 6e-12 quanta — so summation-order
    # jitter decides the rounded value; the r5 embedding_covariance
    # failure mode): per-doc quality is already on the 1e-6 grid, so
    # floor(q·1e6 + 0.5) recovers it as int64, the sum is exact, and
    # floor(sum/n + 0.5)/1e6 is the same deterministic double in every
    # engine/partitioning.
    q_micro = F.floor(
        quality_score(F.col("text")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    agg = (
        docs.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(F.col("text"))).alias("n_tokens"),
            (
                F.floor(
                    F.sum(q_micro) / F.count("*") + F.lit(0.5)
                ) / F.lit(1000000.0)
            ).alias("mean_quality"),
        )
        # materialized once (mixture-cardinality rows) so the total
        # branch and the output share one corpus scan+shuffle;
        # eager=False keeps plan construction job-free
        .localCheckpoint(eager=False)
    )
    total = agg.agg(F.sum("n_tokens").cast("double").alias("_total_tokens"))
    return agg.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        "mean_quality",
        F.round(
            F.col("n_tokens") / F.col("_total_tokens"), 6
        ).alias("token_share"),
    )


SOURCE_MIXTURE_REPORT_SQL = f"""
WITH agg AS (
  SELECT source, lang,
         count(*) AS n_docs,
         CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
         floor(sum(CAST(floor(({_DQ}) * 1000000.0 + 0.5) AS BIGINT))
               * 1.0 / count(*) + 0.5) / 1000000.0 AS mean_quality
  FROM documents
  GROUP BY source, lang
)
SELECT source, lang, n_docs, n_tokens, mean_quality,
       round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS token_share
FROM agg
"""


# --- per-source document cap (FineWeb-style domain cap) ----------------------

CAP_PER_SOURCE = 15


def cap_per_source(spark: SparkSession, sf: str) -> DataFrame:
    """Cap documents per source at CAP_PER_SOURCE, keeping a
    deterministic hash-priority sample — the per-domain cap every
    web-scale pretraining build applies so one giant domain can't
    dominate the mixture (FineWeb/RefinedWeb style). One shuffle on
    source; the window never sorts the corpus globally. Skew note: a
    hot source (the reason this operator exists) makes a hot window
    partition — at 100 TB pre-aggregate with a per-partition partial
    top-k on (source,) before the window, same two-phase trick as
    knn's partial top-k."""
    docs = load_table(spark, "documents", sf)
    priority = _sel_priority()
    w = Window.partitionBy("source").orderBy(
        priority.asc(), F.col("doc_id").asc()
    )
    return docs.select(
        "doc_id", "source", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= CAP_PER_SOURCE)


CAP_PER_SOURCE_SQL = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_SEL_PRIORITY_SQL} ASC,
                    doc_id ASC) AS rk
  FROM documents
)
SELECT doc_id, source, rk FROM ranked WHERE rk <= {CAP_PER_SOURCE}
"""


# --- Z-order layout key (multi-dimensional clustering) -----------------------

ZORDER_BITS = 16


def _morton_expr(x: str, y: str, shift_fn) -> str:
    """Bit-interleave expression text shared by both engines: zkey =
    Σ_i ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1). ``shift_fn(expr, by,
    left)`` renders one shift in the target dialect."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(shift_fn(f"({shift_fn(x, i, False)} & 1)", 2 * i, True))
        terms.append(shift_fn(f"({shift_fn(y, i, False)} & 1)", 2 * i + 1, True))
    return " + ".join(terms)


def _spark_shift(expr: str, by: int, left: bool) -> str:
    if by == 0:
        return expr
    return f"{'shiftleft' if left else 'shiftright'}({expr}, {by})"


def _duck_shift(expr: str, by: int, left: bool) -> str:
    if by == 0:
        return expr
    return f"({expr} {'<<' if left else '>>'} {by})"


def zorder_key(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton) layout key over (user_id, value-bucket) — the
    lakehouse OPTIMIZE ZORDER primitive: writing the table
    repartitionByRange(zkey) clusters rows so parquet min/max prunes
    BOTH dimensions, not just the leading sort column. The key is pure
    bit arithmetic inside whole-stage codegen (zero Python, zero
    shuffle — the optional clustering write is where the range
    partition happens). 16 bits per dimension = 32-bit keys; both
    engines evaluate the identical unrolled interleave."""
    events = load_table(spark, "events", sf)
    x = f"(user_id % {1 << ZORDER_BITS})"
    y = f"(CAST(floor(value) AS BIGINT) % {1 << ZORDER_BITS})"
    return events.selectExpr(
        "event_id", f"{_morton_expr(x, y, _spark_shift)} AS zkey"
    )


ZORDER_KEY_SQL = (
    "SELECT event_id, "
    + _morton_expr(
        f"(user_id % {1 << ZORDER_BITS})",
        f"(CAST(floor(value) AS BIGINT) % {1 << ZORDER_BITS})",
        _duck_shift,
    )
    + " AS zkey FROM events"
)


# --- length-bucketed inference batching --------------------------------------

N_LENGTH_BUCKETS = 8
INFER_BATCH_SIZE = 16


def length_bucket_batches(spark: SparkSession, sf: str) -> DataFrame:
    """Padding-efficient inference batching: documents are ntile'd into
    N_LENGTH_BUCKETS by token count (similar lengths batch together so
    per-batch padding waste is minimal), then split into fixed-size
    batches inside each bucket — the standard layout for batched LLM
    scoring/embedding jobs. Exact global ntile implies a global sort;
    at 100 TB swap it for width_bucket over approx-quantile boundaries
    (one pass, no sort) — semantics identical up to boundary ties,
    which is why the exact form is the oracle anchor here."""
    from ..functions.text import token_count

    docs = load_table(spark, "documents", sf)
    sized = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    w = Window.orderBy(F.col("n_tok").asc(), F.col("doc_id").asc())
    wb = Window.partitionBy("bucket").orderBy(
        F.col("n_tok").asc(), F.col("doc_id").asc()
    )
    return (
        sized.withColumn("bucket", F.ntile(N_LENGTH_BUCKETS).over(w))
        .withColumn(
            "batch_idx",
            ((F.row_number().over(wb) - 1) / INFER_BATCH_SIZE).cast("long"),
        )
    )


LENGTH_BUCKET_BATCHES_SQL = f"""
WITH sized AS (
  SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tok FROM documents
), bucketed AS (
  SELECT doc_id, n_tok,
         ntile({N_LENGTH_BUCKETS}) OVER (ORDER BY n_tok ASC, doc_id ASC)
           AS bucket
  FROM sized
)
SELECT doc_id, n_tok, bucket,
       CAST(floor((row_number() OVER (PARTITION BY bucket
                     ORDER BY n_tok ASC, doc_id ASC) - 1)
                  / {INFER_BATCH_SIZE}) AS BIGINT) AS batch_idx
FROM bucketed
"""


# --- the composed corpus build (flagship data-build DAG) ---------------------

BUILD_QUALITY_MIN = 0.3


def corpus_build_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The full training-corpus build as ONE declarative plan — the
    composition every stage above exists for: quality gate → exact
    dedup (keep min doc_id per SHA-256 fingerprint) → per-source cap
    (hash-priority) → per-source cumulative token budget view. Because
    it is a single DataFrame expression, Catalyst fuses the stage
    predicates into the scan and reuses the source-window partitioning
    across the cap and budget stages — TWO exchanges total
    (fingerprint, source; verified in PLANS.md) — no
    intermediate materialization between stages, which is the point of
    an engine vs a script chain at 100 TB."""
    from ..functions.text import quality_score, token_count

    docs = load_table(spark, "documents", sf)
    fp_w = Window.partitionBy("fp")
    src_w = Window.partitionBy("source").orderBy(
        _sel_priority().asc(),
        F.col("doc_id").asc(),
    )
    return (
        docs.select(
            "doc_id",
            "source",
            quality_score(F.col("text")).alias("quality"),
            F.sha2(F.col("text"), 256).alias("fp"),
            token_count(F.col("text")).alias("n_tok"),
        )
        .filter(F.col("quality") >= BUILD_QUALITY_MIN)
        .withColumn("keep_fp", F.col("doc_id") == F.min("doc_id").over(fp_w))
        .filter(F.col("keep_fp"))
        .withColumn("rk", F.row_number().over(src_w))
        .filter(F.col("rk") <= CAP_PER_SOURCE)
        .select(
            "doc_id",
            "source",
            "quality",
            "n_tok",
            "rk",
            F.sum("n_tok")
            .over(
                src_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("long")
            .alias("cum_tokens"),
        )
    )


CORPUS_BUILD_PIPELINE_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
         {_DQ} AS quality,
         sha256(text) AS fp,
         len(string_split(trim(text), ' ')) AS n_tok
  FROM documents
), gated AS (
  SELECT * FROM scored WHERE quality >= {BUILD_QUALITY_MIN}
), deduped AS (
  SELECT * FROM (
    SELECT *, doc_id = min(doc_id) OVER (PARTITION BY fp) AS keep_fp
    FROM gated
  ) WHERE keep_fp
), capped AS (
  SELECT * FROM (
    SELECT doc_id, source, quality, n_tok,
           row_number() OVER (
             PARTITION BY source
             ORDER BY {_SEL_PRIORITY_SQL} ASC,
                      doc_id ASC) AS rk
    FROM deduped
  ) WHERE rk <= {CAP_PER_SOURCE}
)
SELECT doc_id, source, quality, n_tok, rk,
       CAST(sum(n_tok) OVER (
         PARTITION BY source
         ORDER BY {_SEL_PRIORITY_SQL} ASC,
                  doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens
FROM capped
"""


TRAINING_DATA_QUERIES = {
    "corpus_build_pipeline": (corpus_build_pipeline, CORPUS_BUILD_PIPELINE_SQL),
    "cap_per_source": (cap_per_source, CAP_PER_SOURCE_SQL),
    "zorder_key": (zorder_key, ZORDER_KEY_SQL),
    "epoch_upsample": (epoch_upsample, EPOCH_UPSAMPLE_SQL),
    "span_corruption": (span_corruption, SPAN_CORRUPTION_SQL),
    "length_bucket_batches": (length_bucket_batches, LENGTH_BUCKET_BATCHES_SQL),
    "source_mixture_report": (source_mixture_report, SOURCE_MIXTURE_REPORT_SQL),
    "sequence_packing": (sequence_packing, SEQUENCE_PACKING_SQL),
    "source_quota_sample": (source_quota_sample, SOURCE_QUOTA_SAMPLE_SQL),
    "shard_assignment": (shard_assignment, SHARD_ASSIGNMENT_SQL),
    "embedding_quantization": (embedding_quantization, EMBEDDING_QUANTIZATION_SQL),
    "token_budget_sample": (token_budget_sample, TOKEN_BUDGET_SAMPLE_SQL),
    "quality_weighted_sample": (
        quality_weighted_sample,
        QUALITY_WEIGHTED_SAMPLE_SQL,
    ),
}
