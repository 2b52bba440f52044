"""Training-data pipeline quality operators (north-star extensions):
benchmark contamination, intra-document repetition, policy pattern scan.

These are the corpus-hygiene passes an LLM data pipeline runs between
ingestion and training (the reference's "historical analysis" promise
generalized to corpus analytics; the operators themselves follow the
published recipes — n-gram overlap decontamination and repetition
filters as in the Gopher/RefinedWeb data-quality literature):

- contamination_check: token-trigram overlap between a held-out eval
  slice and the training slice — the decontamination join. Same
  inverted-index shape as dedup_ngram_jaccard: linear in postings-pair
  count, never quadratic in the corpus.
- doc_repetition: fraction of repeated token-trigrams within each
  document (high ⇒ boilerplate/spam) — two aggregations over the SAME
  (doc_id, sid) partitioning, so one shuffle total.
- policy_pattern_scan: per-document regex hit counts (PII-style email
  pattern, long digit runs, keyword mentions) — pure codegen'd
  regexp_count, no UDF. Patterns are RE2-safe (no lookahead) so the
  DuckDB oracle runs them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import _DUCK_POSTINGS, _shingle_postings

EVAL_SOURCE = "src0"  # deterministic held-out slice of the corpus
MIN_SHARED = 3        # trigrams in common before a pair counts as contaminated


def contamination_check(
    spark: SparkSession, sf: str, postings: DataFrame | None = None
) -> DataFrame:
    """(eval_doc, train_doc) pairs sharing >= MIN_SHARED token trigrams,
    with the contaminated fraction of the eval doc.

    The join is postings(eval) ⋈ postings(train) on the trigram id —
    candidate work is Σ df_eval·df_train per shingle, bounded and
    skew-resistant (both sides carry only (doc_id, sid)). The eval
    slice is typically ~1% of the corpus, so the build side is small;
    at 100 TB broadcast the eval postings and the join is shuffle-free.
    ``postings`` lets composed reports (release_readiness) share one
    materialized postings frame instead of re-running the scan pass.
    """
    docs = load_table(spark, "documents", sf)
    # localCheckpointed (see _shingle_postings): referenced via ev (2x)
    # and tr below
    if postings is None:
        postings = _shingle_postings(docs)
    src = docs.select("doc_id", "source")
    tagged = postings.join(src, "doc_id")
    ev = tagged.filter(F.col("source") == EVAL_SOURCE).select(
        F.col("doc_id").alias("eval_id"), "sid"
    )
    tr = tagged.filter(F.col("source") != EVAL_SOURCE).select(
        F.col("doc_id").alias("train_id"), F.col("sid").alias("sid_t")
    )
    ev_sizes = ev.groupBy("eval_id").agg(F.count("*").alias("n_eval_tri"))
    shared = (
        ev.join(tr, F.col("sid") == F.col("sid_t"))
        .groupBy("eval_id", "train_id")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= MIN_SHARED)
    )
    return shared.join(ev_sizes, "eval_id").select(
        "eval_id",
        "train_id",
        "shared",
        F.round(F.col("shared") / F.col("n_eval_tri"), 6).alias("contaminated_frac"),
    )


CONTAMINATION_CHECK_SQL = f"""
WITH {_DUCK_POSTINGS},
tagged AS (
  SELECT p.doc_id, p.sid, d.source
  FROM postings p JOIN documents d USING (doc_id)
),
ev AS (SELECT doc_id AS eval_id, sid FROM tagged WHERE source = '{EVAL_SOURCE}'),
tr AS (SELECT doc_id AS train_id, sid FROM tagged WHERE source <> '{EVAL_SOURCE}'),
ev_sizes AS (SELECT eval_id, count(*) AS n_eval_tri FROM ev GROUP BY eval_id),
shared AS (
  SELECT e.eval_id, t.train_id, count(*) AS shared
  FROM ev e JOIN tr t USING (sid)
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SHARED}
)
SELECT s.eval_id, s.train_id, s.shared,
       round(s.shared / z.n_eval_tri, 6) AS contaminated_frac
FROM shared s JOIN ev_sizes z USING (eval_id)
"""


def doc_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document trigram repetition: total vs distinct trigrams, the
    repeated fraction, and the highest single-trigram frequency — the
    Gopher-style repetition filter inputs.

    Two-level aggregate on one key chain: groupBy(doc_id, sid) then
    groupBy(doc_id) — the second reuses the first's hash partitioning
    (no extra exchange). Everything is codegen'd; no UDF.
    """
    docs = load_table(spark, "documents", sf)
    per_tri = (
        _shingle_postings(docs, distinct=False, materialize=False)  # single pass
        .groupBy("doc_id", "sid")
        .agg(F.count("*").alias("tf"))
    )
    return (
        per_tri.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tri"),
            F.count("*").alias("n_distinct"),
            F.max("tf").alias("max_tf"),
        )
        .select(
            "doc_id",
            "n_tri",
            "n_distinct",
            "max_tf",
            F.round(1.0 - F.col("n_distinct") / F.col("n_tri"), 6).alias(
                "repeated_frac"
            ),
        )
    )


DOC_REPETITION_SQL = f"""
WITH {_DUCK_POSTINGS.replace("SELECT DISTINCT doc_id", "SELECT doc_id")},
per_tri AS (
  SELECT doc_id, sid, count(*) AS tf FROM postings GROUP BY doc_id, sid
)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_tri,
       count(*) AS n_distinct,
       max(tf) AS max_tf,
       round(1.0 - count(*) / CAST(sum(tf) AS DOUBLE), 6) AS repeated_frac
FROM per_tri
GROUP BY doc_id
"""


# RE2-safe (no lookahead/backreference) — runs verbatim on both engines
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
DIGIT_RUN_PAT = r"[0-9]{6,}"
KEYWORD_PAT = r"\b(table|query|join)\b"


def policy_pattern_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document policy pattern counts: PII-style email hits, long
    digit runs, and analytics keyword mentions, plus a redaction flag.

    All three are codegen'd regexp_count over the scanned text — the
    at-scale form of a PII/policy pass (a real pipeline swaps in its
    pattern pack; the plumbing — one projection, no shuffle, no UDF —
    is the point). On this clean synthetic corpus the PII columns are
    legitimately zero; the keyword column carries the signal that the
    counting is real.
    """
    docs = load_table(spark, "documents", sf)
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(EMAIL_PAT)).alias("email_hits"),
        F.regexp_count(F.col("text"), F.lit(DIGIT_RUN_PAT)).alias("digit_run_hits"),
        F.regexp_count(F.col("text"), F.lit(KEYWORD_PAT)).alias("keyword_hits"),
        (
            (F.regexp_count(F.col("text"), F.lit(EMAIL_PAT)) > 0)
            | (F.regexp_count(F.col("text"), F.lit(DIGIT_RUN_PAT)) > 0)
        ).alias("needs_redaction"),
    )


POLICY_PATTERN_SCAN_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_PAT}')) AS email_hits,
       len(regexp_extract_all(text, '{DIGIT_RUN_PAT}')) AS digit_run_hits,
       len(regexp_extract_all(text, '{KEYWORD_PAT}')) AS keyword_hits,
       (len(regexp_extract_all(text, '{EMAIL_PAT}')) > 0
        OR len(regexp_extract_all(text, '{DIGIT_RUN_PAT}')) > 0)
         AS needs_redaction
FROM documents
"""


def pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """The redaction TRANSFORM policy_pattern_scan only counts for:
    mask emails → [EMAIL], long digit runs → [NUM], and the analytics
    keyword pack → [TERM], emitting the rewritten text plus per-pattern
    replacement counts and a changed flag — the standard PII-scrub
    stage of a training-data pipeline (a real deployment swaps in its
    pattern pack; the plumbing is the point).

    All three rewrites are chained codegen'd regexp_replace over one
    scan — no shuffle, no UDF; counts come from regexp_count on the
    ORIGINAL text so they equal what was replaced. Patterns are
    RE2-safe and replacement order is pinned (email first, so digit
    runs inside an address are already masked when [NUM] runs), making
    the output byte-identical across engines. On this clean synthetic
    corpus the PII columns are legitimately zero; the keyword mask
    carries the signal that the rewriting is real."""
    docs = load_table(spark, "documents", sf)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_PAT, "[EMAIL]"),
            DIGIT_RUN_PAT,
            "[NUM]",
        ),
        KEYWORD_PAT,
        "[TERM]",
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted_text"),
        F.regexp_count(F.col("text"), F.lit(EMAIL_PAT)).alias("n_email"),
        F.regexp_count(F.col("text"), F.lit(DIGIT_RUN_PAT)).alias("n_num"),
        F.regexp_count(F.col("text"), F.lit(KEYWORD_PAT)).alias("n_term"),
        (redacted != F.col("text")).alias("changed"),
    )


PII_REDACT_SQL = f"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{EMAIL_PAT}', '[EMAIL]', 'g'),
           '{DIGIT_RUN_PAT}', '[NUM]', 'g'),
         '{KEYWORD_PAT}', '[TERM]', 'g') AS redacted_text,
       len(regexp_extract_all(text, '{EMAIL_PAT}')) AS n_email,
       len(regexp_extract_all(text, '{DIGIT_RUN_PAT}')) AS n_num,
       len(regexp_extract_all(text, '{KEYWORD_PAT}')) AS n_term,
       (regexp_replace(
         regexp_replace(
           regexp_replace(text, '{EMAIL_PAT}', '[EMAIL]', 'g'),
           '{DIGIT_RUN_PAT}', '[NUM]', 'g'),
         '{KEYWORD_PAT}', '[TERM]', 'g') != text) AS changed
FROM documents
"""


# --- quality funnel (per-stage rejection accounting) -------------------------

def quality_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Sequential quality-filter funnel over the corpus: each document
    passes through min-token, stopword-ratio, mean-token-length, and
    composite-quality gates in order; output is one row per stage with
    how many documents entered, failed, and survived — the rejection
    report every pretraining data pipeline publishes alongside its
    filtered corpus.

    One full-corpus pass: all four gate predicates evaluate in a single
    codegen'd projection, the funnel counts are conditional sums in ONE
    aggregate (map-side partial → single row), and the per-stage rows
    explode from that one driver-sized row. Adding stages adds columns,
    not passes — at 100 TB this stays a single scan regardless of
    funnel depth.
    """
    from ..functions.text import quality_score, stopword_count, token_count

    docs = load_table(spark, "documents", sf)
    t = F.col("text")
    n_tok = token_count(t).cast("double")
    n_sw = stopword_count(t).cast("double")
    # chars-per-token over the space-free character count
    mean_len = (F.length(F.trim(t)) - (n_tok - 1)) / n_tok
    flags = docs.select(
        (n_tok >= 25).alias("p1"),
        ((n_sw / n_tok) <= 0.12).alias("p2"),
        mean_len.between(4.2, 5.2).alias("p3"),
        (quality_score(t) >= 0.5).alias("p4"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(F.col("p1"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("p1") & F.col("p2"), 1).otherwise(0)).alias("n2"),
        F.sum(
            F.when(F.col("p1") & F.col("p2") & F.col("p3"), 1).otherwise(0)
        ).alias("n3"),
        F.sum(
            F.when(
                F.col("p1") & F.col("p2") & F.col("p3") & F.col("p4"), 1
            ).otherwise(0)
        ).alias("n4"),
    )
    names = ["min_tokens", "stopword_ratio", "mean_token_len", "composite_quality"]
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_no"),
                F.lit(name).alias("stage"),
                F.col(f"n{i}").alias("n_in"),
                F.col(f"n{i + 1}").alias("n_pass"),
            )
            for i, name in enumerate(names)
        ]
    )
    return agg.select(F.explode(stages).alias("s")).select(
        F.col("s.stage_no").alias("stage_no"),
        F.col("s.stage").alias("stage"),
        F.col("s.n_in").alias("n_in"),
        (F.col("s.n_in") - F.col("s.n_pass")).alias("n_fail"),
        F.col("s.n_pass").alias("n_pass"),
        F.round(F.col("s.n_pass") / F.col("s.n_in"), 6).alias("pass_rate"),
    )


QUALITY_FUNNEL_SQL = """
WITH t AS (
  SELECT len(string_split(trim(text), ' ')) AS n_tok,
         len(list_filter(string_split(trim(text), ' '),
                         x -> x = 'the' OR x = 'a')) AS n_sw,
         len(trim(text)) AS n_chr
  FROM documents
), f AS (
  SELECT n_tok >= 25 AS p1,
         CAST(n_sw AS DOUBLE) / n_tok <= 0.12 AS p2,
         (CAST(n_chr - (n_tok - 1) AS DOUBLE) / n_tok) BETWEEN 4.2 AND 5.2 AS p3,
         round(least(n_tok / 50.0, 1.0)
               * (1.0 - CAST(n_sw AS DOUBLE) / n_tok), 6) >= 0.5 AS p4
  FROM t
), agg AS (
  SELECT count(*) AS n0,
         CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
  FROM f
)
SELECT 1 AS stage_no, 'min_tokens' AS stage, n0 AS n_in,
       n0 - n1 AS n_fail, n1 AS n_pass,
       round(CAST(n1 AS DOUBLE) / n0, 6) AS pass_rate FROM agg
UNION ALL
SELECT 2, 'stopword_ratio', n1, n1 - n2, n2,
       round(CAST(n2 AS DOUBLE) / n1, 6) FROM agg
UNION ALL
SELECT 3, 'mean_token_len', n2, n2 - n3, n3,
       round(CAST(n3 AS DOUBLE) / n2, 6) FROM agg
UNION ALL
SELECT 4, 'composite_quality', n3, n3 - n4, n4,
       round(CAST(n4 AS DOUBLE) / n3, 6) FROM agg
"""


# --- declarative expectation suite (mini data-contract check) ---------------

def expectation_report(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative data-contract audit over the events feed — the
    check suite a pipeline runs before promoting a batch (the
    Great-Expectations shape, relationally):

    - row-level expectations (not-null, range, domain membership)
      evaluate as conditional sums in ONE scan/aggregate;
    - ``unique(event_id)`` is a distinct-count delta riding the same
      aggregate (two-phase distinct, skew-safe);
    - the referential check (every user_id resolves to a customer)
      is one anti-join against the broadcast-sized key dim.

    Adding row-level expectations adds columns, not passes. Output is
    one row per expectation with its violation count — a driver-sized
    report no matter the corpus.
    """
    events = load_table(spark, "events", sf)
    cust = load_table(spark, "customer", sf).select(
        F.col("c_custkey").alias("user_id")
    )
    agg = events.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("event_id").isNull().cast("long")).alias("v_id_null"),
        F.sum(F.col("ts").isNull().cast("long")).alias("v_ts_null"),
        F.sum(
            (
                F.col("value").isNull()
                | (F.col("value") < 0)
                | (F.col("value") > 500)
            ).cast("long")
        ).alias("v_value_range"),
        F.sum(
            (
                # NULL must VIOLATE the domain check — a bare NOT IN is
                # three-valued and silently passes NULL rows
                F.col("event_type").isNull()
                | ~F.col("event_type").isin(
                    "click", "view", "purchase", "signup", "error"
                )
            ).cast("long")
        ).alias("v_type_domain"),
        (F.count("event_id") - F.countDistinct("event_id")).alias("v_id_dup"),
    )
    orphans = (
        events.select("user_id")
        .join(F.broadcast(cust), "user_id", "left_anti")
        .agg(F.count("*").alias("v_fk"))
    )
    rep = agg.crossJoin(orphans)
    exp = [
        ("event_id_not_null", "v_id_null"),
        ("ts_not_null", "v_ts_null"),
        ("value_in_0_500", "v_value_range"),
        ("event_type_in_domain", "v_type_domain"),
        ("event_id_unique", "v_id_dup"),
        ("user_id_references_customer", "v_fk"),
    ]
    stack = ", ".join(f"'{name}', {col}" for name, col in exp)
    return rep.selectExpr(
        f"stack({len(exp)}, {stack}) AS (expectation, n_violations)",
        "n_rows",
    ).select(
        "expectation",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("passed"),
    )


EXPECTATION_REPORT_SQL = """
WITH agg AS (
  SELECT count(*) AS n_rows,
         sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS v_id_null,
         sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS v_ts_null,
         sum(CASE WHEN value IS NULL OR value < 0 OR value > 500
                  THEN 1 ELSE 0 END) AS v_value_range,
         sum(CASE WHEN event_type IS NULL OR event_type NOT IN
                    ('click', 'view', 'purchase', 'signup', 'error')
                  THEN 1 ELSE 0 END) AS v_type_domain,
         count(event_id) - count(DISTINCT event_id) AS v_id_dup
  FROM events
), fk AS (
  SELECT count(*) AS v_fk
  FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
  WHERE c.c_custkey IS NULL
), rep AS (
  SELECT * FROM agg CROSS JOIN fk
), stacked AS (
  SELECT 'event_id_not_null' AS expectation,
         CAST(v_id_null AS BIGINT) AS n_violations, n_rows FROM rep
  UNION ALL SELECT 'ts_not_null', CAST(v_ts_null AS BIGINT), n_rows FROM rep
  UNION ALL SELECT 'value_in_0_500', CAST(v_value_range AS BIGINT), n_rows
    FROM rep
  UNION ALL SELECT 'event_type_in_domain', CAST(v_type_domain AS BIGINT),
    n_rows FROM rep
  UNION ALL SELECT 'event_id_unique', CAST(v_id_dup AS BIGINT), n_rows
    FROM rep
  UNION ALL SELECT 'user_id_references_customer', CAST(v_fk AS BIGINT),
    n_rows FROM rep
)
SELECT expectation, n_violations, CAST(n_rows AS BIGINT) AS n_rows,
       n_violations = 0 AS passed
FROM stacked
"""


# --- column profiler ---------------------------------------------------------

def column_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Deequ/ydata-style column profile of the events fact in ONE scan:
    per column — null count, exact distinct count, numeric min/max
    (timestamps as epoch seconds, doubles rounded), lexicographic
    min/max for strings. The single wide aggregate produces every
    metric as a column; ``stack`` pivots the one result row into the
    per-column relation driver-side of the shuffle.

    Exact multi-column distinct counts expand the scan (one pass per
    distinct column under Catalyst's Expand) — acceptable for a
    profiling job; the 100 TB standing-dashboard path swaps
    ``count_distinct`` for ``approx_count_distinct`` and loses the
    oracle, nothing else."""
    ev = load_table(spark, "events", sf).select(
        "event_id",
        F.unix_timestamp("ts").alias("ts_s"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    # TWO aggregates over the same scan instead of one (r10, guide
    # §2.3): the 6 exact count_distincts plan as a 7x Expand, and every
    # OTHER aggregate (nulls/min/max/count) riding that plan is
    # evaluated against the expanded row stream — measured +1.3 s at
    # sf0.1 (core 1.08 s, core+minmax 2.39 s). Splitting keeps the
    # min/max pass Expand-free; the two one-row results crossJoin for
    # free. (Fanning the scan out instead LOSES: the exchange ships
    # props strings and costs more than it parallelizes — interleaved
    # A/B 2.11 s vs 1.21 s.) Output is value-identical: same
    # aggregates, same names, one scan shape apart.
    prof_cols = ("event_id", "ts_s", "user_id", "event_type", "value", "props")
    base = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
            for c in prof_cols
        ],
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
        F.min("ts_s").alias("min_ts_s"),
        F.max("ts_s").alias("max_ts_s"),
        F.min("user_id").alias("min_user_id"),
        F.max("user_id").alias("max_user_id"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.min("event_type").alias("min_event_type"),
        F.max("event_type").alias("max_event_type"),
        F.min("props").alias("min_props"),
        F.max("props").alias("max_props"),
    )
    dist = ev.agg(
        *[F.count_distinct(F.col(c)).alias(f"dist_{c}") for c in prof_cols]
    )
    agg = base.crossJoin(dist)
    return agg.selectExpr(
        """stack(6,
             'event_id',   null_event_id,   dist_event_id,
                CAST(min_event_id AS DOUBLE), CAST(max_event_id AS DOUBLE),
                CAST(NULL AS STRING), CAST(NULL AS STRING),
             'ts_epoch_s', null_ts_s,       dist_ts_s,
                CAST(min_ts_s AS DOUBLE), CAST(max_ts_s AS DOUBLE),
                CAST(NULL AS STRING), CAST(NULL AS STRING),
             'user_id',    null_user_id,    dist_user_id,
                CAST(min_user_id AS DOUBLE), CAST(max_user_id AS DOUBLE),
                CAST(NULL AS STRING), CAST(NULL AS STRING),
             'event_type', null_event_type, dist_event_type,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                min_event_type, max_event_type,
             'value',      null_value,      dist_value,
                min_value, max_value,
                CAST(NULL AS STRING), CAST(NULL AS STRING),
             'props',      null_props,      dist_props,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                min_props, max_props
           ) AS (column, n_null, n_distinct, min_num, max_num, min_str, max_str)""",
        "n_rows",
    ).select(
        "column", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


COLUMN_PROFILE_SQL = """
WITH ev AS (
  -- floor, not cast: epoch() returns fractional seconds and CAST
  -- rounds, while Spark's unix_timestamp truncates to the second
  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, user_id,
         event_type, value, props
  FROM events
), a AS (
  SELECT count(*) AS n_rows,
         CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
         CAST(sum(CASE WHEN ts_s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts_s,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
         CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
         CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
         count(DISTINCT event_id) AS dist_event_id,
         count(DISTINCT ts_s) AS dist_ts_s,
         count(DISTINCT user_id) AS dist_user_id,
         count(DISTINCT event_type) AS dist_event_type,
         count(DISTINCT value) AS dist_value,
         count(DISTINCT props) AS dist_props,
         min(event_id) AS min_event_id, max(event_id) AS max_event_id,
         min(ts_s) AS min_ts_s, max(ts_s) AS max_ts_s,
         min(user_id) AS min_user_id, max(user_id) AS max_user_id,
         round(min(value), 6) AS min_value, round(max(value), 6) AS max_value,
         min(event_type) AS min_event_type, max(event_type) AS max_event_type,
         min(props) AS min_props, max(props) AS max_props
  FROM ev
)
SELECT 'event_id' AS "column", n_rows, null_event_id AS n_null,
       dist_event_id AS n_distinct, CAST(min_event_id AS DOUBLE) AS min_num,
       CAST(max_event_id AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM a
UNION ALL
SELECT 'ts_epoch_s', n_rows, null_ts_s, dist_ts_s,
       CAST(min_ts_s AS DOUBLE), CAST(max_ts_s AS DOUBLE), NULL, NULL FROM a
UNION ALL
SELECT 'user_id', n_rows, null_user_id, dist_user_id,
       CAST(min_user_id AS DOUBLE), CAST(max_user_id AS DOUBLE), NULL, NULL
FROM a
UNION ALL
SELECT 'event_type', n_rows, null_event_type, dist_event_type,
       NULL, NULL, min_event_type, max_event_type FROM a
UNION ALL
SELECT 'value', n_rows, null_value, dist_value,
       min_value, max_value, NULL, NULL FROM a
UNION ALL
SELECT 'props', n_rows, null_props, dist_props,
       NULL, NULL, min_props, max_props FROM a
"""


# --- cross-table referential-integrity audit ---------------------------------

# (relation label, child table, fk column, parent table, pk column).
# events.user_id -> customer is the deliberately cross-domain row: the
# event feed is not governed by the warehouse's FK discipline, so it is
# where orphans actually appear in practice.
_FK_RELATIONS = [
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
]


def fk_integrity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit across every declared FK edge — the
    cross-TABLE data contract that expectation_report (single-table)
    cannot see: orphan child rows, distinct orphan keys, and parents
    never referenced, one row per relation. This is the join-hygiene
    report a pipeline publishes before trusting multi-table joins as
    training features (an orphaned FK silently drops rows in every
    inner join downstream).

    Scale shape: per relation, the child collapses to a key HISTOGRAM
    first (groupBy fk — one shuffle on the key, map-side combined) and
    the parent to its distinct keys, so the full-outer join that
    classifies orphans/unreferenced is key-cardinality-sized, never
    row-sized; both sides arrive hash-partitioned on the same key so
    the join adds no exchange. NULL FKs are reported separately, not
    as orphans. Relations audit independently (a union of one-row
    aggregates — embarrassingly parallel across tables at 100 TB).
    """
    rows = []
    for name, child, fk, parent, pk in _FK_RELATIONS:
        hist = (
            load_table(spark, child, sf)
            .groupBy(F.col(fk).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        par = (
            load_table(spark, parent, sf)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("p", F.lit(1))
        )
        f = hist.join(par, "k", "full")
        child_k = F.col("c").isNotNull()
        orphan = child_k & F.col("k").isNotNull() & F.col("p").isNull()
        rows.append(
            f.agg(
                F.sum(F.coalesce(F.col("c"), F.lit(0))).alias(
                    "n_child_rows"
                ),
                F.sum(
                    F.when(F.col("k").isNull() & child_k, F.col("c")).otherwise(0)
                ).alias("n_null_fk_rows"),
                F.sum(F.when(orphan, F.col("c")).otherwise(0)).alias(
                    "n_orphan_rows"
                ),
                F.sum(F.when(orphan, 1).otherwise(0)).alias("n_orphan_keys"),
                F.sum(F.when(F.col("p") == 1, 1).otherwise(0)).alias(
                    "n_parent_keys"
                ),
                F.sum(
                    F.when((F.col("p") == 1) & ~child_k, 1).otherwise(0)
                ).alias("n_unreferenced_parents"),
            ).select(F.lit(name).alias("relation"), "*")
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _fk_audit_sql() -> str:
    blocks = []
    for name, child, fk, parent, pk in _FK_RELATIONS:
        blocks.append(f"""
SELECT '{name}' AS relation,
       CAST(sum(coalesce(c, 0)) AS BIGINT) AS n_child_rows,
       CAST(sum(CASE WHEN k IS NULL AND c IS NOT NULL THEN c ELSE 0 END)
            AS BIGINT) AS n_null_fk_rows,
       CAST(sum(CASE WHEN c IS NOT NULL AND k IS NOT NULL AND p IS NULL
                THEN c ELSE 0 END) AS BIGINT) AS n_orphan_rows,
       CAST(sum(CASE WHEN c IS NOT NULL AND k IS NOT NULL AND p IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_keys,
       CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_parent_keys,
       CAST(sum(CASE WHEN p = 1 AND c IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unreferenced_parents
FROM (
  SELECT coalesce(h.k, p.k) AS k, h.c, p.p
  FROM (SELECT {fk} AS k, count(*) AS c FROM {child} GROUP BY 1) h
  FULL JOIN (SELECT DISTINCT {pk} AS k, 1 AS p FROM {parent}) p
    ON h.k = p.k
)""")
    return "\nUNION ALL\n".join(blocks)


# --- k-anonymity / l-diversity audit ----------------------------------------

K_ANON = 50   # minimum rows per quasi-identifier class
L_DIV = 25    # minimum distinct users (sensitive attr) per class


def k_anonymity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the event feed before it
    is released as training data: rows are grouped by their
    quasi-identifier class (event_type, 6-hour time band, value
    hundred-band) and each class reports its row count (k-anonymity)
    and distinct-user count (l-diversity) with an ``at_risk`` flag —
    the re-identification report that decides which classes need
    suppression or coarsening. Completes the privacy surface next to
    ``pii_redact`` (content scrubbing) with structural disclosure
    risk.

    Scale shape: QI classes are computed in one codegen'd projection
    (value band via exact integer cents, so no float boundary exists);
    the exact distinct-user count uses the two-phase pre-dedup —
    groupBy(class, user) then groupBy(class) — so no Expand ever
    multiplies the scan and both aggregates are map-side combined.
    Output is QI-cardinality-sized regardless of corpus size.
    """
    events = load_table(spark, "events", sf)
    cents = F.round(F.col("value") * 100).cast("long")
    classes = events.select(
        "event_type",
        F.floor(F.hour("ts") / F.lit(6)).cast("int").alias("hour_band"),
        F.floor(cents / F.lit(10000.0)).cast("int").alias("value_band"),
        "user_id",
    )
    per_user = classes.groupBy(
        "event_type", "hour_band", "value_band", "user_id"
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        per_user.groupBy("event_type", "hour_band", "value_band")
        .agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_users"),
        )
        .select(
            "event_type",
            "hour_band",
            "value_band",
            "n_rows",
            "n_users",
            (
                (F.col("n_rows") < K_ANON) | (F.col("n_users") < L_DIV)
            ).alias("at_risk"),
        )
    )


K_ANONYMITY_AUDIT_SQL = f"""
WITH classes AS (
  SELECT event_type,
         CAST(floor(hour(ts) / 6) AS INT) AS hour_band,
         CAST(floor(CAST(round(value * 100) AS BIGINT) / 10000.0) AS INT)
           AS value_band,
         user_id
  FROM events
), per_user AS (
  SELECT event_type, hour_band, value_band, user_id, count(*) AS c
  FROM classes GROUP BY 1, 2, 3, 4
)
SELECT event_type, hour_band, value_band,
       CAST(sum(c) AS BIGINT) AS n_rows,
       count(*) AS n_users,
       (sum(c) < {K_ANON} OR count(*) < {L_DIV}) AS at_risk
FROM per_user
GROUP BY 1, 2, 3
"""


# --- k-anonymity generalization (the release mechanism) ---------------------

def k_anonymity_generalize(spark: SparkSession, sf: str) -> DataFrame:
    """The release mechanism the audit above gates: every finest-grain
    quasi-identifier class is assigned the first level of a fixed
    generalization hierarchy at which it satisfies k-anonymity AND
    l-diversity — level 0 = (type, hour band, value hundred-band),
    level 1 = widen the value axis to 400-bands, level 2 = drop the
    value axis entirely, level -1 = suppress (unsafe even fully
    generalized). This is how a feed actually ships: coarsen just
    enough, suppress the rest, and publish the level per class so the
    consumer knows each row's resolution.

    Scale shape: one scan builds the finest (class, user) pre-dedup;
    all three hierarchy levels re-aggregate that dedup table (classes
    × users sized, not corpus sized), because a user distinct at a
    coarse grain is exactly a distinct (coarse class, user) pair from
    the finest pre-dedup. Three bounded aggregates + two broadcast-
    joinable lookups back to the finest classes — output stays
    QI-cardinality-sized.
    """
    events = load_table(spark, "events", sf)
    cents = F.round(F.col("value") * 100).cast("long")
    base = events.select(
        "event_type",
        F.floor(F.hour("ts") / F.lit(6)).cast("int").alias("hour_band"),
        F.floor(cents / F.lit(10000.0)).cast("int").alias("value_band"),
        "user_id",
    )
    pu0 = base.groupBy(
        "event_type", "hour_band", "value_band", "user_id"
    ).agg(F.count(F.lit(1)).alias("c"))

    def _safe(df, *keys):
        return df.groupBy(*keys).agg(
            (
                (F.sum("c") >= K_ANON)
                & (F.count(F.lit(1)) >= L_DIV)
            ).alias("safe")
        )

    l0 = _safe(pu0, "event_type", "hour_band", "value_band")
    # coarser grains re-dedup users from the finest (class, user) table
    pu1 = (
        pu0.withColumn(
            "band4", F.floor(F.col("value_band") / F.lit(4)).cast("int")
        )
        .groupBy("event_type", "hour_band", "band4", "user_id")
        .agg(F.sum("c").alias("c"))
    )
    l1 = _safe(pu1, "event_type", "hour_band", "band4")
    pu2 = pu0.groupBy("event_type", "hour_band", "user_id").agg(
        F.sum("c").alias("c")
    )
    l2 = _safe(pu2, "event_type", "hour_band")

    fin = pu0.groupBy("event_type", "hour_band", "value_band").agg(
        F.sum("c").alias("n_rows")
    ).withColumn(
        "band4", F.floor(F.col("value_band") / F.lit(4)).cast("int")
    )
    out = (
        fin.join(l0.withColumnRenamed("safe", "s0"),
                 ["event_type", "hour_band", "value_band"])
        .join(F.broadcast(l1.withColumnRenamed("safe", "s1")),
              ["event_type", "hour_band", "band4"])
        .join(F.broadcast(l2.withColumnRenamed("safe", "s2")),
              ["event_type", "hour_band"])
        .select(
            "event_type",
            "hour_band",
            "value_band",
            "n_rows",
            F.when(F.col("s0"), 0)
            .when(F.col("s1"), 1)
            .when(F.col("s2"), 2)
            .otherwise(-1)
            .alias("release_level"),
        )
    )
    return out


K_ANONYMITY_GENERALIZE_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(floor(hour(ts) / 6) AS INT) AS hour_band,
         CAST(floor(CAST(round(value * 100) AS BIGINT) / 10000.0) AS INT)
           AS value_band,
         user_id
  FROM events
), pu0 AS (
  SELECT event_type, hour_band, value_band, user_id, count(*) AS c
  FROM base GROUP BY 1, 2, 3, 4
), l0 AS (
  SELECT event_type, hour_band, value_band,
         (sum(c) >= {K_ANON} AND count(*) >= {L_DIV}) AS s0
  FROM pu0 GROUP BY 1, 2, 3
), pu1 AS (
  SELECT event_type, hour_band,
         CAST(floor(value_band / 4) AS INT) AS band4, user_id,
         sum(c) AS c
  FROM pu0 GROUP BY 1, 2, 3, 4
), l1 AS (
  SELECT event_type, hour_band, band4,
         (sum(c) >= {K_ANON} AND count(*) >= {L_DIV}) AS s1
  FROM pu1 GROUP BY 1, 2, 3
), pu2 AS (
  SELECT event_type, hour_band, user_id, sum(c) AS c
  FROM pu0 GROUP BY 1, 2, 3
), l2 AS (
  SELECT event_type, hour_band,
         (sum(c) >= {K_ANON} AND count(*) >= {L_DIV}) AS s2
  FROM pu2 GROUP BY 1, 2
), fin AS (
  SELECT event_type, hour_band, value_band,
         CAST(floor(value_band / 4) AS INT) AS band4,
         CAST(sum(c) AS BIGINT) AS n_rows
  FROM pu0 GROUP BY 1, 2, 3, 4
)
SELECT f.event_type, f.hour_band, f.value_band, f.n_rows,
       CASE WHEN l0.s0 THEN 0 WHEN l1.s1 THEN 1 WHEN l2.s2 THEN 2
            ELSE -1 END AS release_level
FROM fin f
JOIN l0 USING (event_type, hour_band, value_band)
JOIN l1 USING (event_type, hour_band, band4)
JOIN l2 USING (event_type, hour_band)
"""


# --- release readiness (the one-row gate report) -----------------------------

def release_readiness(spark: SparkSession, sf: str) -> DataFrame:
    """The one-row report that gates a training-data release —
    corpus size, quality-funnel survivors, near-duplicate pair count,
    eval-contamination pairs, and re-identification-risky QI classes,
    composed from the SAME operators the registry ships individually
    (this query calls them; it cannot drift from them). Each input
    collapses to a one-row aggregate before the broadcast crossJoins,
    so composing N checks costs their individual plans plus N
    single-row joins — the manifest a 100 TB pipeline publishes next
    to every release tag.

    The two shingle consumers (LSH dedup, contamination) share ONE
    vocabulary hash and ONE materialized doc-set scan pass: postings
    are an explode away from the checkpointed sets, so composing them
    here no longer re-runs the corpus tokenize+hash per check (the
    standalone queries each pay it once; the composition used to pay
    it twice plus two vocabulary jobs).
    """
    from .dedup import _shingle_sets, dedup_minhash_lsh

    docs = load_table(spark, "documents", sf)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_documents"))
    surv = (
        quality_funnel(spark, sf)
        .filter(F.col("stage_no") == 4)
        .select(F.col("n_pass").alias("n_funnel_survivors"))
    )
    doc_sets = _shingle_sets(docs, with_minhash=True)
    postings = doc_sets.select("doc_id", F.explode("sids").alias("sid"))
    dups = dedup_minhash_lsh(spark, sf, doc_sets=doc_sets).agg(
        F.count(F.lit(1)).alias("n_neardup_pairs")
    )
    cont = contamination_check(spark, sf, postings=postings).agg(
        F.count(F.lit(1)).alias("n_contaminated_pairs")
    )
    risky = k_anonymity_audit(spark, sf).agg(
        F.sum(F.when(F.col("at_risk"), 1).otherwise(0)).alias(
            "n_risky_qi_classes"
        )
    )
    out = n_docs
    for part in (surv, dups, cont, risky):
        out = out.crossJoin(F.broadcast(part))
    return out


def _release_readiness_sql() -> str:
    from .dedup import _duck_minhash_sql

    return f"""
SELECT
  (SELECT count(*) FROM documents) AS n_documents,
  (SELECT n_pass FROM ({QUALITY_FUNNEL_SQL}) WHERE stage_no = 4)
    AS n_funnel_survivors,
  (SELECT count(*) FROM ({_duck_minhash_sql()})) AS n_neardup_pairs,
  (SELECT count(*) FROM ({CONTAMINATION_CHECK_SQL})) AS n_contaminated_pairs,
  (SELECT CAST(sum(CASE WHEN at_risk THEN 1 ELSE 0 END) AS BIGINT)
   FROM ({K_ANONYMITY_AUDIT_SQL})) AS n_risky_qi_classes
"""


# --- differential-privacy noisy release --------------------------------------

DP_EPSILON = 1.0       # Laplace scale b = sensitivity/epsilon; count sens = 1
DP_MULT = 48_947       # noise-hash multiplier — deliberately distinct from
DP_ADD = 29            # the selection (69_621) and shard (40_503) constants
_HASH_MOD = 1_000_000_007
_HASH_BASE = 31


def dp_noisy_counts(spark: SparkSession, sf: str) -> DataFrame:
    """ε-differentially-private release of the per-(type, day) event
    histogram — the Laplace mechanism (sensitivity 1 for counts, scale
    b = 1/ε), completing the governance family: where k-anonymity
    suppresses/coarsens, DP perturbs and PUBLISHES every class with a
    calibrated noise floor. Noise here is PSEUDO-noise — inverse-CDF
    Laplace over a portable two-round affine hash of the class key —
    so the release is reproducible and oracle-checkable; a production
    release swaps the hash for a CSPRNG draw and the plan, accounting,
    and ε are unchanged (the docstring-level seam, like the
    multimodal decode fallback). Because the noise is recomputable
    from the published key, the release itself carries NO privacy
    guarantee yet — the output says so: the ``mechanism`` column is
    ``laplace_pseudo`` (a CSPRNG build would publish ``laplace``), so
    a consumer can never mistake the oracle-checkable twin for a real
    DP release by reading the schema alone.

    Scale shape: one aggregate to the class histogram (bounded by
    type × day cardinality), then pure per-row math — the noise adds
    zero shuffles. The hash constant set is disjoint from the
    selection/shard hashes so DP noise can never correlate with
    sampling decisions (the r5 decorrelation lesson).
    """
    events = load_table(spark, "events", sf)
    hist = (
        events.select(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    from ..functions.text import fingerprint

    key = F.concat_ws("|", "event_type", "day")
    h0 = fingerprint(key)
    h1 = (h0 * DP_MULT + DP_ADD) % _HASH_MOD
    h2 = (h1 * DP_MULT + DP_ADD) % _HASH_MOD
    u = (h2 + 0.5) / _HASH_MOD  # (0,1), never exactly 0/1/0.5
    b = 1.0 / DP_EPSILON
    noise = (
        -F.lit(b)
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return hist.select(
        "event_type",
        "day",
        "n_events",
        F.lit(DP_EPSILON).alias("epsilon"),
        F.lit("laplace_pseudo").alias("mechanism"),
        F.round(F.col("n_events") + noise, 6).alias("noisy_count"),
    )


_DUCK_KEY_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({s}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    f"(acc, c) -> (acc * {_HASH_BASE} + c) % {_HASH_MOD})"
)

DP_NOISY_COUNTS_SQL = f"""
WITH hist AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
), hashed AS (
  SELECT event_type, day, n_events,
         ((({_DUCK_KEY_HASH.format(s="event_type || '|' || day")}
            * {DP_MULT} + {DP_ADD}) % {_HASH_MOD})
          * {DP_MULT} + {DP_ADD}) % {_HASH_MOD} AS h2
  FROM hist
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
       CAST({DP_EPSILON} AS DOUBLE) AS epsilon,
       'laplace_pseudo' AS mechanism,
       round(n_events + (-1.0 / {DP_EPSILON})
             * sign((h2 + 0.5) / {_HASH_MOD} - 0.5)
             * ln(1.0 - 2.0 * abs((h2 + 0.5) / {_HASH_MOD} - 0.5)), 6)
         AS noisy_count
FROM hashed
"""


# --- corpus novelty (df=1 shingle share per document) ------------------------

def doc_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document novelty: the share of a document's distinct
    token-trigram shingles that occur NOWHERE else in the corpus
    (document frequency 1). Low novelty marks template/boilerplate
    text whose content is already covered elsewhere — the
    diversity-vs-redundancy signal dedup pair queries can't give for
    documents that are partial mosaics of many others. Documents with
    fewer than 3 tokens have no shingles and are absent, matching the
    postings definition.

    Scale shape: reuses the shared shingle-postings generator
    (vocab-hash broadcast + codegen shingle compose, materialized once
    — both the df aggregate and the join back read it); df is one
    sid-keyed aggregate (vocabulary-sized, the inverted_index shape)
    and the verdict is one sid-keyed join + doc-keyed aggregate —
    linear in postings, no pair join anywhere. Novelty is an
    exact-int single division (order-free, midpoint-safe).
    """
    docs = load_table(spark, "documents", sf)
    posts = _shingle_postings(docs)
    df_stats = posts.groupBy("sid").agg(F.count(F.lit(1)).alias("df"))
    return (
        posts.join(df_stats, "sid")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias(
                "novelty"
            ),
        )
    )


DOC_NOVELTY_SQL = f"""
WITH {_DUCK_POSTINGS},
df AS (
  SELECT sid, count(*) AS df FROM postings GROUP BY sid
)
SELECT p.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS novelty
FROM postings p JOIN df d USING (sid)
GROUP BY p.doc_id
"""


# --- weak-supervision vote (Snorkel-style label-matrix diagnostics) ---------

# (name, +1 condition, -1 condition) triples are materialized as vote
# columns v1..v4 in one projection; every diagnostic below is a
# conditional sum over those four small ints.
_LF_NAMES = ("lf_length", "lf_lang", "lf_stopword", "lf_distinct")


def weak_label_vote(spark: SparkSession, sf: str) -> DataFrame:
    """Weak-supervision labeling-function diagnostics over the corpus
    (the Snorkel label-matrix report): four heuristic labeling
    functions each vote keep(+1)/drop(-1)/abstain(0) per document;
    consensus is the vote-sum sign. Output is one row per LF —
    coverage, polarity counts, overlap with other voters, conflicts,
    and agreement with consensus — plus a consensus summary row. This
    is the report a pipeline publishes before trusting an ensemble of
    quality heuristics as training labels.

    All votes are integer-exact: ratio thresholds use cross-multiplied
    integer comparisons (``10*n_sw <= n_tok``), never float division,
    so no rounding boundary exists for partitioning to flip. One
    full-corpus scan: the vote matrix is a single codegen'd projection,
    every diagnostic is a conditional sum in ONE aggregate (map-side
    partial -> one driver-sized row), and the per-LF rows explode from
    that row — adding labeling functions adds columns, not passes, so
    at 100 TB this stays a single scan like quality_funnel.
    """
    from ..functions.text import stopword_count, token_count, tokens

    docs = load_table(spark, "documents", sf)
    t = F.col("text")
    n_tok = token_count(t)
    n_sw = stopword_count(t)
    n_dis = F.size(F.array_distinct(tokens(t)))
    votes = [
        F.when(F.col("n_chars") >= 150, 1)
        .when(F.col("n_chars") < 60, -1)
        .otherwise(0),
        F.when(F.col("lang") == "en", 1).otherwise(-1),
        F.when(10 * n_sw <= n_tok, 1).when(4 * n_sw >= n_tok, -1).otherwise(0),
        F.when(2 * n_dis >= n_tok, 1).when(3 * n_dis < n_tok, -1).otherwise(0),
    ]
    mat = docs.select(
        *[v.alias(f"v{j + 1}") for j, v in enumerate(votes)]
    ).withColumn(
        "c",
        F.signum(sum(F.col(f"v{j + 1}") for j in range(4))).cast("int"),
    )

    def _n(cond):  # conditional count as a sum column
        return F.sum(F.when(cond, 1).otherwise(0))

    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for j in range(4):
        vj = F.col(f"v{j + 1}")
        others = [F.col(f"v{k + 1}") for k in range(4) if k != j]
        other_voted = sum((o != 0).cast("int") for o in others) > 0
        other_disagrees = (
            sum(((o != 0) & (o != vj)).cast("int") for o in others) > 0
        )
        aggs += [
            _n(vj == 1).alias(f"pos{j}"),
            _n(vj == -1).alias(f"neg{j}"),
            _n((vj != 0) & other_voted).alias(f"ovl{j}"),
            _n((vj != 0) & other_disagrees).alias(f"cfl{j}"),
            _n((vj != 0) & (F.col("c") != 0) & (vj == F.col("c"))).alias(
                f"agr{j}"
            ),
            _n((vj != 0) & (F.col("c") != 0)).alias(f"dec{j}"),
        ]
    aggs += [_n(F.col("c") == 1).alias("cpos"), _n(F.col("c") == -1).alias("cneg")]
    one = mat.agg(*aggs)

    rows = [
        F.struct(
            F.lit(name).alias("lf"),
            F.col(f"pos{j}").alias("n_pos"),
            F.col(f"neg{j}").alias("n_neg"),
            F.round(
                (F.col(f"pos{j}") + F.col(f"neg{j}")) / F.col("n_docs"), 6
            ).alias("coverage"),
            F.col(f"ovl{j}").alias("n_overlap"),
            F.col(f"cfl{j}").alias("n_conflict"),
            F.round(
                F.col(f"agr{j}") / F.nullif(F.col(f"dec{j}"), F.lit(0)), 6
            ).alias("agree_rate"),
        )
        for j, name in enumerate(_LF_NAMES)
    ]
    rows.append(
        F.struct(
            F.lit("consensus").alias("lf"),
            F.col("cpos").alias("n_pos"),
            F.col("cneg").alias("n_neg"),
            F.round(
                (F.col("cpos") + F.col("cneg")) / F.col("n_docs"), 6
            ).alias("coverage"),
            F.lit(0).cast("long").alias("n_overlap"),
            F.lit(0).cast("long").alias("n_conflict"),
            F.lit(1.0).alias("agree_rate"),
        )
    )
    return one.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


WEAK_LABEL_VOTE_SQL = """
WITH base AS (
  SELECT n_chars, lang,
         len(string_split(trim(text), ' ')) AS n_tok,
         len(list_filter(string_split(trim(text), ' '),
                         x -> x = 'the' OR x = 'a')) AS n_sw,
         len(list_distinct(string_split(trim(text), ' '))) AS n_dis
  FROM documents
), v AS (
  SELECT CASE WHEN n_chars >= 150 THEN 1 WHEN n_chars < 60 THEN -1
              ELSE 0 END AS v1,
         CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS v2,
         CASE WHEN 10 * n_sw <= n_tok THEN 1
              WHEN 4 * n_sw >= n_tok THEN -1 ELSE 0 END AS v3,
         CASE WHEN 2 * n_dis >= n_tok THEN 1
              WHEN 3 * n_dis < n_tok THEN -1 ELSE 0 END AS v4
  FROM base
), w AS (
  SELECT v1, v2, v3, v4, CAST(sign(v1 + v2 + v3 + v4) AS INT) AS c FROM v
), agg AS (
  SELECT count(*) AS n_docs, {lf_sums},
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
         CAST(sum(CASE WHEN c = -1 THEN 1 ELSE 0 END) AS BIGINT) AS cneg
  FROM w
)
{lf_rows}
UNION ALL
SELECT 'consensus', cpos, cneg,
       round(CAST(cpos + cneg AS DOUBLE) / n_docs, 6),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT), 1.0 FROM agg
"""


def _weak_label_vote_sql() -> str:
    sums, rows = [], []
    for j, name in enumerate(_LF_NAMES):
        vj = f"v{j + 1}"
        others = [f"v{k + 1}" for k in range(4) if k != j]
        other_voted = " + ".join(
            f"CASE WHEN {o} <> 0 THEN 1 ELSE 0 END" for o in others
        )
        other_dis = " + ".join(
            f"CASE WHEN {o} <> 0 AND {o} <> {vj} THEN 1 ELSE 0 END"
            for o in others
        )
        for alias, cond in [
            (f"pos{j}", f"{vj} = 1"),
            (f"neg{j}", f"{vj} = -1"),
            (f"ovl{j}", f"{vj} <> 0 AND ({other_voted}) > 0"),
            (f"cfl{j}", f"{vj} <> 0 AND ({other_dis}) > 0"),
            (f"agr{j}", f"{vj} <> 0 AND c <> 0 AND {vj} = c"),
            (f"dec{j}", f"{vj} <> 0 AND c <> 0"),
        ]:
            sums.append(
                f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS {alias}"
            )
        rows.append(
            f"SELECT '{name}' AS lf, pos{j} AS n_pos, neg{j} AS n_neg,\n"
            f"       round(CAST(pos{j} + neg{j} AS DOUBLE) / n_docs, 6)"
            f" AS coverage,\n"
            f"       ovl{j} AS n_overlap, cfl{j} AS n_conflict,\n"
            f"       round(CAST(agr{j} AS DOUBLE) / nullif(dec{j}, 0), 6)"
            f" AS agree_rate FROM agg"
        )
    return WEAK_LABEL_VOTE_SQL.format(
        lf_sums=",\n         ".join(sums),
        lf_rows="\nUNION ALL\n".join(rows),
    )


T_CLOSE_E6 = 200_000  # t-closeness threshold t = 0.2 (integer-scaled)


def t_closeness_audit(spark: SparkSession, sf: str) -> DataFrame:
    """t-closeness audit — the third rung of the release-privacy ladder
    after ``k_anonymity_audit`` (class size + l-diversity): a class can
    be large and diverse yet still leak if its SENSITIVE-ATTRIBUTE
    DISTRIBUTION diverges from the corpus (e.g. one QI class holds all
    the high-value events). Per quasi-identifier class (event_type,
    6-hour band), reports the total-variation distance between the
    class's value-band distribution and the global one, flagged at
    t = 0.2 — TVD is the standard t-closeness distance for categorical
    sensitive attributes (Li et al., ICDE'07 use EMD; for unordered
    categories EMD degenerates to exactly TVD).

    Exact integer arithmetic end-to-end: TVD = ½·Σ_v |p_c(v) − p_g(v)|
    cross-multiplies to ``Σ_v |cnt_v·N_g − gcnt_v·N_c|`` over bands
    PRESENT in the class, plus ``N_c·(N_g − Σ_present gcnt_v)`` for the
    absent-band mass — so no dense class×band spine is ever built and
    no float division happens before the final scaled ``DIV``.

    Scale shape: one corpus shuffle onto the (class, value_band) grid
    (map-side combined; grid bounded by QI × band cardinality, not
    rows), then band-histogram joins — the global band distribution is
    broadcast (≤ value range / 100 rows) and the 1-row grand total is a
    broadcast crossJoin. Overflow bound: the final numerator is
    ``1e6 · (present_num + …)`` with ``present_num ≤ 2·N_c·N_g``, so
    BIGINT exactness requires ``N_c·N_g < ~4.6e12`` (e.g. a 4.6e3-row
    class in a 1e9-row corpus) — well short of the raw-count ceiling;
    past it, swap the tvd_e6 expression to DECIMAL(38,0) on both
    engines (the ``ab_test_report`` discipline, same expressions).
    """
    events = load_table(spark, "events", sf)
    cents = F.round(F.col("value") * 100).cast("long")
    base = events.select(
        "event_type",
        F.floor(F.hour("ts") / F.lit(6)).cast("int").alias("hour_band"),
        F.floor(cents / F.lit(10000.0)).cast("int").alias("value_band"),
    )
    cls = base.groupBy("event_type", "hour_band", "value_band").agg(
        F.count("*").alias("cnt")
    )
    totals = cls.groupBy("event_type", "hour_band").agg(
        F.sum("cnt").alias("n_class")
    )
    gdist = cls.groupBy("value_band").agg(F.sum("cnt").alias("gcnt"))
    grand = gdist.agg(F.sum("gcnt").alias("n_all"))  # 1-row broadcast
    per_class = (
        cls.join(F.broadcast(gdist), "value_band")
        .join(totals, ["event_type", "hour_band"])
        .crossJoin(F.broadcast(grand))
        .groupBy("event_type", "hour_band", "n_class", "n_all")
        .agg(
            F.sum(
                F.abs(
                    F.col("cnt") * F.col("n_all")
                    - F.col("gcnt") * F.col("n_class")
                )
            ).alias("present_num"),
            F.sum("gcnt").alias("g_present"),
        )
    )
    return per_class.select(
        "event_type",
        "hour_band",
        F.col("n_class").alias("n_rows"),
        F.expr(
            "(1000000 * (present_num + n_class * (n_all - g_present)))"
            " DIV (2 * n_class * n_all)"
        ).alias("tvd_e6"),
    ).withColumn("at_risk", F.col("tvd_e6") > T_CLOSE_E6)


T_CLOSENESS_AUDIT_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(floor(hour(ts) / 6) AS INT) AS hour_band,
         CAST(floor(CAST(round(value * 100) AS BIGINT) / 10000.0) AS INT)
           AS value_band
  FROM events
), cls AS (
  SELECT event_type, hour_band, value_band, CAST(count(*) AS BIGINT) AS cnt
  FROM base GROUP BY 1, 2, 3
), totals AS (
  SELECT event_type, hour_band, CAST(sum(cnt) AS BIGINT) AS n_class
  FROM cls GROUP BY 1, 2
), gdist AS (
  SELECT value_band, CAST(sum(cnt) AS BIGINT) AS gcnt FROM cls GROUP BY 1
), grand AS (
  SELECT CAST(sum(gcnt) AS BIGINT) AS n_all FROM gdist
), per_class AS (
  SELECT c.event_type, c.hour_band, t.n_class, gr.n_all,
         CAST(sum(abs(c.cnt * gr.n_all - g.gcnt * t.n_class)) AS BIGINT)
           AS present_num,
         CAST(sum(g.gcnt) AS BIGINT) AS g_present
  FROM cls c
  JOIN gdist g USING (value_band)
  JOIN totals t USING (event_type, hour_band)
  CROSS JOIN grand gr
  GROUP BY 1, 2, 3, 4
)
SELECT event_type, hour_band, n_class AS n_rows,
       (1000000 * (present_num + n_class * (n_all - g_present)))
         // (2 * n_class * n_all) AS tvd_e6,
       (1000000 * (present_num + n_class * (n_all - g_present)))
         // (2 * n_class * n_all) > {T_CLOSE_E6} AS at_risk
FROM per_class
"""


PIPELINE_QUALITY_QUERIES = {
    "column_profile": (column_profile, COLUMN_PROFILE_SQL),
    "expectation_report": (expectation_report, EXPECTATION_REPORT_SQL),
    "contamination_check": (contamination_check, CONTAMINATION_CHECK_SQL),
    "doc_repetition": (doc_repetition, DOC_REPETITION_SQL),
    "policy_pattern_scan": (policy_pattern_scan, POLICY_PATTERN_SCAN_SQL),
    "pii_redact": (pii_redact, PII_REDACT_SQL),
    "quality_funnel": (quality_funnel, QUALITY_FUNNEL_SQL),
    "weak_label_vote": (weak_label_vote, _weak_label_vote_sql()),
    "doc_novelty": (doc_novelty, DOC_NOVELTY_SQL),
    "fk_integrity_audit": (fk_integrity_audit, _fk_audit_sql()),
    "k_anonymity_audit": (k_anonymity_audit, K_ANONYMITY_AUDIT_SQL),
    "k_anonymity_generalize": (
        k_anonymity_generalize,
        K_ANONYMITY_GENERALIZE_SQL,
    ),
    "t_closeness_audit": (t_closeness_audit, T_CLOSENESS_AUDIT_SQL),
    "dp_noisy_counts": (dp_noisy_counts, DP_NOISY_COUNTS_SQL),
    "release_readiness": (release_readiness, _release_readiness_sql()),
}
