"""ML evaluation / training primitives: rank-based AUC, KS score
separation, histogram split finding, and out-of-fold target encoding.

The reference pitches "AI-enhanced" surveillance (README; main.py runs
a detector and thresholds its scores at 0.5) but ships no way to ask
whether that threshold — or the model behind it — is any good. These
are the evaluation/feature primitives a team training the quality or
detection models in this engine's pipelines would run over the lake:
ROC-AUC and KS to grade a scorer, histogram split finding (the
XGBoost/LightGBM approximate-split step) to grow trees on aggregates
instead of rows, and leakage-safe out-of-fold target encoding to build
categorical features for those models.

All four are pure Column expressions over fixed-point integer grids —
no UDFs, no floats until (at most) a final declared-scale ratio — so
both engines bucket, rank, and divide identically.

Scale posture (the common trick): every per-row value is first snapped
to a BOUNDED integer grid (score microunits, value cents, bins), so the
one corpus-cardinality shuffle is a partial-aggregated groupBy onto a
grid whose size is bounded by the VALUE RANGE, not the row count. The
windows that follow run over grid-sized frames. BIGINT scaled products
are exact up to ~1e18; the 100 TB path swaps those columns to
DECIMAL(38,0) (same expressions — Spark decimal arithmetic is exact),
which is noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

N_CLASSES = 10         # embeddings.label ∈ [0, 9]
SCORE_SCALE = 1_000_000  # score microunits: grid ≤ (range × 1e6) cells


def auc_evaluation(spark: SparkSession, sf: str) -> DataFrame:
    """One-vs-rest ROC-AUC per class: class c's "classifier head" is
    embedding component c (a deterministic stand-in for a trained
    head's logit), positives are rows with ``label = c``.

    AUC is computed exactly as the Mann-Whitney U statistic over the
    microunit score grid: group scores to (class, score_fp) histogram
    cells, one cumulative window per class, then
    ``U×2 = Σ pos_at · (2·cum_neg_below + neg_at)`` — the doubled form
    keeps the tie term (½ per tied pair) in integers. ``auc_e6`` is the
    integer-scaled ratio, exact on both engines.

    Scale: the explode is a fixed ×N_CLASSES fanout of a 2-column
    projection; the groupBy lands on the (class, score_fp) grid —
    bounded by score range × 1e6 cells per class, NOT by corpus rows —
    and partial-aggregates map-side. The per-class cumulative window
    sorts only grid cells (≤ ~740k for unit-norm components). U×2 ≤
    n_pos·n_neg → BIGINT-exact below ~3e9 rows/class; beyond that the
    u2/auc columns move to DECIMAL(38,0), same expressions.
    """
    emb = load_table(spark, "embeddings", sf)
    scored = emb.select(
        "label",
        F.posexplode(F.slice("embedding", 1, N_CLASSES)).alias("cls", "score"),
    ).select(
        "cls",
        F.floor(F.col("score").cast("double") * SCORE_SCALE)
        .cast("long")
        .alias("s_fp"),
        (F.col("label") == F.col("cls")).cast("long").alias("pos"),
    )
    g = scored.groupBy("cls", "s_fp").agg(
        F.sum("pos").alias("pos_at"),
        (F.count("*") - F.sum("pos")).alias("neg_at"),
    )
    below = (
        Window.partitionBy("cls")
        .orderBy("s_fp")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = g.select(
        "cls",
        "pos_at",
        "neg_at",
        F.coalesce(F.sum("neg_at").over(below), F.lit(0)).alias("cum_neg_below"),
    )
    return (
        cum.groupBy("cls")
        .agg(
            F.sum("pos_at").alias("n_pos"),
            F.sum("neg_at").alias("n_neg"),
            F.sum(
                F.col("pos_at") * (2 * F.col("cum_neg_below") + F.col("neg_at"))
            ).alias("u2"),
        )
        .select(
            "cls",
            "n_pos",
            "n_neg",
            "u2",
            F.expr("(1000000 * u2) DIV (2 * n_pos * n_neg)").alias("auc_e6"),
        )
    )


AUC_EVALUATION_SQL = f"""
WITH classes AS (
  SELECT unnest(range({N_CLASSES})) AS cls
), scored AS (
  SELECT c.cls,
         CAST(floor(CAST(e.embedding[c.cls + 1] AS DOUBLE) * {SCORE_SCALE})
              AS BIGINT) AS s_fp,
         CASE WHEN e.label = c.cls THEN 1 ELSE 0 END AS pos
  FROM embeddings e CROSS JOIN classes c
), g AS (
  SELECT cls, s_fp,
         CAST(sum(pos) AS BIGINT) AS pos_at,
         CAST(count(*) - sum(pos) AS BIGINT) AS neg_at
  FROM scored GROUP BY 1, 2
), cum AS (
  SELECT cls, pos_at, neg_at,
         CAST(coalesce(sum(neg_at) OVER (
           PARTITION BY cls ORDER BY s_fp
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_neg_below
  FROM g
), agg AS (
  SELECT cls,
         CAST(sum(pos_at) AS BIGINT) AS n_pos,
         CAST(sum(neg_at) AS BIGINT) AS n_neg,
         CAST(sum(pos_at * (2 * cum_neg_below + neg_at)) AS BIGINT) AS u2
  FROM cum GROUP BY cls
)
SELECT cls, n_pos, n_neg, u2,
       (1000000 * u2) // (2 * n_pos * n_neg) AS auc_e6
FROM agg
"""


# --- Kolmogorov-Smirnov separation per event type ----------------------------

def ks_score_separation(spark: SparkSession, sf: str) -> DataFrame:
    """Per event type: exact two-sample Kolmogorov-Smirnov distance
    between this type's ``value`` distribution and all OTHER types' —
    the standard "is this segment's score distribution shifted?" check
    (model monitoring, cohort drift).

    Values snap to the cents grid (``round(value·100)``, exact two-
    decimal data), the sup is taken over the observed grid, and the
    CDF difference is cross-multiplied — ``|cum_this·n_rest −
    cum_rest·n_this|`` — so no division happens before the argmax.
    ``ks_e6`` is the integer-scaled statistic; ``at_cents`` the grid
    point attaining it (earliest on ties).

    Scale: one corpus shuffle onto the (type, cents) grid (bounded by
    value range × 100 cells), then a types × grid spine (≤ 5 × 49k
    rows here — bounded by the grid, never by corpus rows) carries the
    cumulative windows. Cross-products are BIGINT-exact below ~3e9
    rows/type; DECIMAL(38,0) beyond.
    """
    events = load_table(spark, "events", sf)
    cents = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    per_type = cents.groupBy("event_type", "cents").agg(
        F.count("*").alias("n_at")
    )
    grid = per_type.select("cents").distinct()
    types = per_type.select("event_type").distinct()
    totals = per_type.groupBy("event_type").agg(F.sum("n_at").alias("n_this"))
    grand = totals.agg(F.sum("n_this").alias("n_all"))  # 1-row dim, stays lazy
    spine = (
        types.crossJoin(grid)
        .join(per_type, ["event_type", "cents"], "left")
        .select(
            "event_type",
            "cents",
            F.coalesce("n_at", F.lit(0)).alias("own_at"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the spine is COMPLETE (every type × every grid point), so the
    # global CDF at a grid point is the sum of the per-type cumulatives
    # there — a window partitioned by cents (5 rows/partition), never a
    # single-partition global ordering
    gall = Window.partitionBy("cents")
    cum = (
        spine.withColumn("cum_own", F.sum("own_at").over(w))
        .withColumn("cum_all", F.sum("cum_own").over(gall))
        .join(F.broadcast(totals), "event_type")
        .crossJoin(F.broadcast(grand))
        .withColumn("n_rest", F.col("n_all") - F.col("n_this"))
        .withColumn(
            "dev",
            F.abs(
                F.col("cum_own") * F.col("n_rest")
                - (F.col("cum_all") - F.col("cum_own")) * F.col("n_this")
            ),
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("dev").desc(), F.col("cents").asc()
    )
    return (
        cum.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_this",
            "n_rest",
            F.col("dev").alias("ks_num"),
            F.expr("(1000000 * dev) DIV (n_this * n_rest)").alias("ks_e6"),
            F.col("cents").alias("at_cents"),
        )
    )


KS_SCORE_SEPARATION_SQL = """
WITH cents AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), per_type AS (
  SELECT event_type, cents, count(*) AS n_at FROM cents GROUP BY 1, 2
), grid AS (
  SELECT DISTINCT cents FROM per_type
), types AS (
  SELECT event_type, CAST(sum(n_at) AS BIGINT) AS n_this
  FROM per_type GROUP BY 1
), grand AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all FROM cents
), spine AS (
  SELECT t.event_type, g.cents, coalesce(p.n_at, 0) AS own_at
  FROM types t CROSS JOIN grid g
  LEFT JOIN per_type p ON p.event_type = t.event_type AND p.cents = g.cents
), cumo AS (
  SELECT event_type, cents,
         CAST(sum(own_at) OVER (
           PARTITION BY event_type ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_own
  FROM spine
), cum AS (
  SELECT c.event_type, c.cents, c.cum_own,
         CAST(sum(c.cum_own) OVER (PARTITION BY c.cents) AS BIGINT) AS cum_all,
         t.n_this, (SELECT n_all FROM grand) - t.n_this AS n_rest
  FROM cumo c
  JOIN types t ON t.event_type = c.event_type
), dev AS (
  SELECT event_type, cents, n_this, n_rest,
         abs(cum_own * n_rest - (cum_all - cum_own) * n_this) AS dev,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(cum_own * n_rest -
                                         (cum_all - cum_own) * n_this) DESC,
                                     cents ASC) AS rn
  FROM cum
)
SELECT event_type, n_this, n_rest, dev AS ks_num,
       (1000000 * dev) // (n_this * n_rest) AS ks_e6,
       cents AS at_cents
FROM dev WHERE rn = 1
"""


# --- histogram-based best-split finding --------------------------------------

VALUE_BIN_W = 10.0
VALUE_BIN_MAX = 48
USER_MOD = 16
GINI_SCALE = 1_000_000


def tree_split_finder(spark: SparkSession, sf: str) -> DataFrame:
    """Best binary split per feature for the target ``event_type =
    'error'`` — the histogram (approximate-split) step every
    distributed GBDT trainer runs per node: aggregate rows into
    per-feature bins ONCE, then evaluate all candidate thresholds on
    the bin histogram, never touching rows again.

    Features: ``value`` binned at width 10 (capped bin 48), hour of
    day, ``user_id mod 16``. Split candidates are "bin ≤ b" for every
    non-terminal bin; the criterion is weighted Gini impurity in e6
    fixed point — ``(2·posL·negL·1e6) DIV nL + (2·posR·negR·1e6) DIV
    nR`` — integer-exact per term on both engines. Winner per feature
    = min score, earliest bin on ties.

    Scale: one scan with a ×3 (n_features) explode of a 2-column
    projection, partial-aggregated onto the (feature, bin) histogram —
    ≤ 49+24+16 cells total regardless of corpus size; everything after
    is window math over those cells. The scaled products are
    BIGINT-exact below ~2e9 rows; DECIMAL(38,0) beyond (same DIV
    expressions — this is LightGBM's int64 histogram bound, hit the
    same way).
    """
    events = load_table(spark, "events", sf)
    vbin = F.least(
        F.lit(VALUE_BIN_MAX), F.floor(F.col("value") / VALUE_BIN_W)
    ).cast("long")
    stacked = events.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("value_bin").alias("feature"), vbin.alias("bin")
                ),
                F.struct(
                    F.lit("hour").alias("feature"),
                    F.hour("ts").cast("long").alias("bin"),
                ),
                F.struct(
                    F.lit("user_mod").alias("feature"),
                    (F.col("user_id") % USER_MOD).alias("bin"),
                ),
            )
        ).alias("fb"),
        (F.col("event_type") == "error").cast("long").alias("pos"),
    ).select("fb.feature", "fb.bin", "pos")
    hist = stacked.groupBy("feature", "bin").agg(
        F.count("*").alias("n"), F.sum("pos").alias("p")
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("feature")
    cum = hist.select(
        "feature",
        "bin",
        F.sum("n").over(w).alias("n_left"),
        F.sum("p").over(w).alias("pos_left"),
        (F.sum("n").over(tot) - F.sum("n").over(w)).alias("n_right"),
        (F.sum("p").over(tot) - F.sum("p").over(w)).alias("pos_right"),
    ).filter(F.col("n_right") > 0)
    scored = cum.withColumn(
        "gini_e6",
        F.expr(
            f"(2 * pos_left * (n_left - pos_left) * {GINI_SCALE}) DIV n_left"
            f" + (2 * pos_right * (n_right - pos_right) * {GINI_SCALE})"
            f" DIV n_right"
        ),
    )
    pick = Window.partitionBy("feature").orderBy(
        F.col("gini_e6").asc(), F.col("bin").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "feature",
            F.col("bin").alias("split_bin"),
            "n_left",
            "pos_left",
            "n_right",
            "pos_right",
            "gini_e6",
        )
    )


TREE_SPLIT_FINDER_SQL = f"""
WITH stacked AS (
  SELECT f.feature, f.bin,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS pos
  FROM events, LATERAL (VALUES
    ('value_bin', CAST(least({VALUE_BIN_MAX}, floor(value / {VALUE_BIN_W}))
                       AS BIGINT)),
    ('hour', CAST(extract(hour FROM ts) AS BIGINT)),
    ('user_mod', user_id % {USER_MOD})
  ) AS f(feature, bin)
), hist AS (
  SELECT feature, bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS p
  FROM stacked GROUP BY 1, 2
), cum AS (
  SELECT feature, bin,
         CAST(sum(n) OVER cw AS BIGINT) AS n_left,
         CAST(sum(p) OVER cw AS BIGINT) AS pos_left,
         CAST(sum(n) OVER tw - sum(n) OVER cw AS BIGINT) AS n_right,
         CAST(sum(p) OVER tw - sum(p) OVER cw AS BIGINT) AS pos_right
  FROM hist
  WINDOW cw AS (PARTITION BY feature ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         tw AS (PARTITION BY feature)
), scored AS (
  SELECT *,
         (2 * pos_left * (n_left - pos_left) * {GINI_SCALE}) // n_left
         + (2 * pos_right * (n_right - pos_right) * {GINI_SCALE}) // n_right
           AS gini_e6
  FROM cum WHERE n_right > 0
), best AS (
  SELECT *, row_number() OVER (PARTITION BY feature
                               ORDER BY gini_e6 ASC, bin ASC) AS rn
  FROM scored
)
SELECT feature, bin AS split_bin, n_left, pos_left, n_right, pos_right,
       gini_e6
FROM best WHERE rn = 1
"""


# --- leakage-safe out-of-fold target encoding --------------------------------

N_FOLDS = 5
PRIOR_W = 20


def target_encode_oof(spark: SparkSession, sf: str) -> DataFrame:
    """Out-of-fold smoothed mean-target encoding of ``event_type``
    against the cents-grid target — the leakage-safe categorical
    feature construction (fold f's encoding never sees fold f's rows;
    folds are ``user_id mod 5`` so a user never leaks into their own
    feature).

    ``enc_e6 = 1e6·(sum_other + W·prior) DIV (cnt_other + W)`` with
    the prior the integer global mean (cents) and W=20 pseudo-counts —
    the standard smoothing that keeps rare keys near the prior. All
    integers: sums are exact cents, divisions are declared-floor.

    Scale: one corpus shuffle partial-aggregated onto (key, fold) — 25
    cells here, bounded by |keys|×folds — then per-key totals come
    from a window over those cells and the global prior broadcasts as
    one row. Scaled sums are BIGINT-exact below ~1e13 cents of total
    value; DECIMAL(38,0) beyond.
    """
    events = load_table(spark, "events", sf)
    base = events.select(
        "event_type",
        (F.col("user_id") % N_FOLDS).alias("fold"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    kf = base.groupBy("event_type", "fold").agg(
        F.count("*").alias("cnt_f"), F.sum("cents").alias("sum_f")
    )
    tot = Window.partitionBy("event_type")
    g = base.agg(
        F.expr("sum(cents) DIV count(*)").alias("prior_cents")
    )
    return (
        kf.withColumn("cnt_k", F.sum("cnt_f").over(tot))
        .withColumn("sum_k", F.sum("sum_f").over(tot))
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "fold",
            (F.col("cnt_k") - F.col("cnt_f")).alias("n_other"),
            "prior_cents",
            F.expr(
                f"(1000000 * (sum_k - sum_f + {PRIOR_W} * prior_cents))"
                f" DIV (cnt_k - cnt_f + {PRIOR_W})"
            ).alias("enc_e6"),
        )
    )


TARGET_ENCODE_OOF_SQL = f"""
WITH base AS (
  SELECT event_type, user_id % {N_FOLDS} AS fold,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), kf AS (
  SELECT event_type, fold, CAST(count(*) AS BIGINT) AS cnt_f,
         CAST(sum(cents) AS BIGINT) AS sum_f
  FROM base GROUP BY 1, 2
), g AS (
  SELECT CAST(sum(cents) AS BIGINT) // count(*) AS prior_cents FROM base
), tot AS (
  SELECT *, CAST(sum(cnt_f) OVER (PARTITION BY event_type) AS BIGINT) AS cnt_k,
         CAST(sum(sum_f) OVER (PARTITION BY event_type) AS BIGINT) AS sum_k
  FROM kf
)
SELECT event_type, fold, cnt_k - cnt_f AS n_other, g.prior_cents,
       (1000000 * (sum_k - sum_f + {PRIOR_W} * g.prior_cents))
         // (cnt_k - cnt_f + {PRIOR_W}) AS enc_e6
FROM tot CROSS JOIN g
"""


# --- two-arm experiment report ------------------------------------------------

AB_SIGMA = 2  # 2σ decision rule for both the effect test and the SRM check


def ab_test_report(spark: SparkSession, sf: str) -> DataFrame:
    """Experimentation readout per event type: users split into two
    arms by ``user_id mod 2``, the per-event value (cents) compared
    with a Welch-style two-sample test, plus the sample-ratio-mismatch
    (SRM) guard every experimentation platform runs before trusting an
    effect.

    The significance tests are EXACT integer comparisons — the 2σ rule
    cross-multiplied until no division remains:
    ``(s_t·n_c − s_c·n_t)²·(n_t−1)(n_c−1) > 4·[(n_t·q_t−s_t²)·n_c²·(n_c−1)
    + (n_c·q_c−s_c²)·n_t²·(n_t−1)]`` for the effect (μ, s², and the
    Welch variance all cleared), and ``(n_c−n_t)² > 4·(n_c+n_t)`` for
    SRM. The cleared products exceed int64, so BOTH engines evaluate
    them in exact 128-bit integer arithmetic (Spark DECIMAL(38,0),
    DuckDB HUGEINT) — never a float; only the scalar-sized booleans
    and e6 means are emitted.

    Scale: one corpus shuffle partial-aggregated onto the (type, arm)
    grid (≤ 10 cells); the wide-integer test runs on those cells.
    128-bit stays exact while ``(Σcents·n)² < 10^38`` — beyond that,
    the co-moments are already tiny per cell and the test moves to
    arbitrary-precision on the driver.
    """
    events = load_table(spark, "events", sf)
    cells = (
        events.select(
            "event_type",
            (F.col("user_id") % 2).alias("arm"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "arm")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).alias("q"),
        )
    )
    c = cells.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_c"),
        F.col("s").alias("s_c"),
        F.col("q").alias("q_c"),
    )
    t = cells.filter(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("n_t"),
        F.col("s").alias("s_t"),
        F.col("q").alias("q_t"),
    )
    # widen the BASE aggregates before any product — casting after an
    # int64 multiply would overflow before the decimal ever saw it
    wide = (
        "(CAST(s_t AS DECIMAL(38,0)) * n_c - CAST(s_c AS DECIMAL(38,0)) * n_t)"
    )
    vt = "(CAST(q_t AS DECIMAL(38,0)) * n_t - CAST(s_t AS DECIMAL(38,0)) * s_t)"
    vc = "(CAST(q_c AS DECIMAL(38,0)) * n_c - CAST(s_c AS DECIMAL(38,0)) * s_c)"
    joined = c.join(t, "event_type")
    return joined.select(
        "event_type",
        "n_c",
        "n_t",
        F.expr("(1000000 * s_c) DIV n_c").alias("mean_c_e6"),
        F.expr("(1000000 * s_t) DIV n_t").alias("mean_t_e6"),
        F.expr(
            "(1000000 * s_t) DIV n_t - (1000000 * s_c) DIV n_c"
        ).alias("effect_e6"),
        F.expr(
            f"({wide} * {wide} * (n_t - 1) * (n_c - 1))"
            f" > {AB_SIGMA * AB_SIGMA} * ("
            f"{vt} * n_c * n_c * (n_c - 1)"
            f" + {vc} * n_t * n_t * (n_t - 1)"
            ")"
        ).alias("significant"),
        (
            (F.col("n_c") - F.col("n_t")) * (F.col("n_c") - F.col("n_t"))
            > AB_SIGMA * AB_SIGMA * (F.col("n_c") + F.col("n_t"))
        ).alias("srm_flag"),
    )


AB_TEST_REPORT_SQL = f"""
WITH cells AS (
  SELECT event_type, user_id % 2 AS arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, n AS n_c, s AS s_c, q AS q_c FROM cells WHERE arm = 0
), t AS (
  SELECT event_type, n AS n_t, s AS s_t, q AS q_t FROM cells WHERE arm = 1
)
SELECT c.event_type, n_c, n_t,
       (1000000 * s_c) // n_c AS mean_c_e6,
       (1000000 * s_t) // n_t AS mean_t_e6,
       (1000000 * s_t) // n_t - (1000000 * s_c) // n_c AS effect_e6,
       ((CAST(s_t AS HUGEINT) * n_c - CAST(s_c AS HUGEINT) * n_t)
          * (CAST(s_t AS HUGEINT) * n_c - CAST(s_c AS HUGEINT) * n_t)
          * (n_t - 1) * (n_c - 1))
         > {AB_SIGMA * AB_SIGMA} * (
             (CAST(q_t AS HUGEINT) * n_t - CAST(s_t AS HUGEINT) * s_t)
               * n_c * n_c * (n_c - 1)
             + (CAST(q_c AS HUGEINT) * n_c - CAST(s_c AS HUGEINT) * s_c)
               * n_t * n_t * (n_t - 1)
           ) AS significant,
       (n_c - n_t) * (n_c - n_t)
         > {AB_SIGMA * AB_SIGMA} * (n_c + n_t) AS srm_flag
FROM c JOIN t USING (event_type)
"""


def average_precision(spark: SparkSession, sf: str) -> DataFrame:
    """One-vs-rest average precision per class over the same microunit
    score grid as ``auc_evaluation`` — the PR-curve summary that grades
    a scorer where positives are rare (AUC saturates under class
    imbalance; AP does not). Matches the threshold-sweep definition
    (sklearn's ``average_precision_score``): at each distinct score
    threshold t (descending), precision P_t = cumP/cumT and recall step
    ΔR_t = pos_at/n_pos, and AP = Σ_t ΔR_t · P_t.

    Fixed-point spec, exact on both engines: every per-threshold term
    is the INTEGER ``(1e9 · pos_at · cumP) DIV cumT`` (floor at e9, so
    cross-engine float division never happens), and the final
    ``ap_e6 = Σterms DIV (1000 · n_pos)``. Floor-per-threshold is the
    pinned semantics — both engines compute bit-identical BIGINTs.

    Scale: identical posture to ``auc_evaluation`` — fixed ×N_CLASSES
    fanout of a 2-column projection, one groupBy onto the
    (class, score_fp) grid (bounded by score range × 1e6 cells, not
    corpus rows, partial-aggregated map-side), one grid-sized
    cumulative window per class. 1e9·pos_at·cumP ≤ 1e9·n_pos² →
    BIGINT-exact below ~3e4 rows/class... at 1e9-row classes the term
    columns move to DECIMAL(38,0), same expressions (the AUC row's
    standing note).
    """
    emb = load_table(spark, "embeddings", sf)
    scored = emb.select(
        "label",
        F.posexplode(F.slice("embedding", 1, N_CLASSES)).alias("cls", "score"),
    ).select(
        "cls",
        F.floor(F.col("score").cast("double") * SCORE_SCALE)
        .cast("long")
        .alias("s_fp"),
        (F.col("label") == F.col("cls")).cast("long").alias("pos"),
    )
    g = scored.groupBy("cls", "s_fp").agg(
        F.sum("pos").alias("pos_at"),
        F.count("*").alias("tot_at"),
    )
    desc_cum = (
        Window.partitionBy("cls")
        .orderBy(F.desc("s_fp"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = g.select(
        "cls",
        "pos_at",
        F.sum("pos_at").over(desc_cum).alias("cum_pos"),
        F.sum("tot_at").over(desc_cum).alias("cum_tot"),
    )
    return (
        cum.groupBy("cls")
        .agg(
            F.max("cum_pos").alias("n_pos"),
            F.sum(
                F.expr("(1000000000 * pos_at * cum_pos) DIV cum_tot")
            ).alias("term_sum"),
        )
        .select(
            "cls",
            "n_pos",
            F.expr("term_sum DIV (1000 * n_pos)").alias("ap_e6"),
        )
    )


AVERAGE_PRECISION_SQL = f"""
WITH classes AS (
  SELECT unnest(range({N_CLASSES})) AS cls
), scored AS (
  SELECT c.cls,
         CAST(floor(CAST(e.embedding[c.cls + 1] AS DOUBLE) * {SCORE_SCALE})
              AS BIGINT) AS s_fp,
         CASE WHEN e.label = c.cls THEN 1 ELSE 0 END AS pos
  FROM embeddings e CROSS JOIN classes c
), g AS (
  SELECT cls, s_fp,
         CAST(sum(pos) AS BIGINT) AS pos_at,
         CAST(count(*) AS BIGINT) AS tot_at
  FROM scored GROUP BY 1, 2
), cum AS (
  SELECT cls, pos_at,
         CAST(sum(pos_at) OVER (
           PARTITION BY cls ORDER BY s_fp DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_pos,
         CAST(sum(tot_at) OVER (
           PARTITION BY cls ORDER BY s_fp DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tot
  FROM g
), agg AS (
  SELECT cls,
         max(cum_pos) AS n_pos,
         CAST(sum((1000000000 * pos_at * cum_pos) // cum_tot) AS BIGINT)
           AS term_sum
  FROM cum GROUP BY cls
)
SELECT cls, n_pos, term_sum // (1000 * n_pos) AS ap_e6
FROM agg
"""


NDCG_K = 20
# log2 discounts on the e6 grid, precomputed HERE so neither engine
# evaluates a float log: D[i] = floor(1e6 / log2(i+1)) for rank i —
# pinned integer constants, identical literals in the Spark plan and
# the DuckDB SQL (cross-engine libm log2 may differ in the last ulp;
# a literal can't)
_NDCG_DISCOUNTS_E6 = [
    int(1_000_000 // __import__("math").log2(i + 1))
    for i in range(1, NDCG_K + 1)
]
# IDCG prefix sums: P[m] = sum of the first m discounts (1-indexed)
_NDCG_IDCG_E6 = [
    sum(_NDCG_DISCOUNTS_E6[:m]) for m in range(1, NDCG_K + 1)
]


def ndcg_at_k(spark: SparkSession, sf: str) -> DataFrame:
    """One-vs-rest nDCG@k per class over the ``average_precision``
    fixture (VERDICT r8 Next #6) — the standard graded-ranking metric
    completing the retrieval-eval family (AUC, KS, AP, MRR): rank all
    vectors by class-c score descending, binary relevance
    ``label == c``, ``DCG@k = Σ_{i≤k} rel_i · 1/log2(i+1)`` and
    ``nDCG = DCG / IDCG@min(k, n_pos)``.

    Pinned exact spec: ties break on (score_fp DESC, vec_id ASC); the
    log2 discounts are the module-level INTEGER e6 constants (see
    ``_NDCG_DISCOUNTS_E6`` — neither engine computes a log), so
    ``dcg_e6`` is a BIGINT sum of literals and
    ``ndcg_e6 = (1e6·dcg_e6) DIV idcg_e6`` a BIGINT floor division —
    bit-identical cross-engine, no float anywhere.

    Scale: a global per-class sort would be one reducer per class; the
    plan instead prefilters through the same (cls, s_fp) microunit
    histogram the AP/AUC queries build — cum counts over the
    grid-sized window find the k-th row's score cut per class, the
    corpus is filtered to ``s_fp ≥ cut`` (≤ k + one-bucket ties rows
    per class survive), and ONLY survivors enter the row_number
    window. The full corpus is touched by exactly one map-side-combined
    groupBy; the exact-sort cost is paid on a k-bounded set.
    """
    emb = load_table(spark, "embeddings", sf)
    scored = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.slice("embedding", 1, N_CLASSES)).alias("cls", "score"),
    ).select(
        "vec_id",
        "cls",
        F.floor(F.col("score").cast("double") * SCORE_SCALE)
        .cast("long")
        .alias("s_fp"),
        (F.col("label") == F.col("cls")).cast("long").alias("pos"),
    )
    g = scored.groupBy("cls", "s_fp").agg(
        F.sum("pos").alias("pos_at"), F.count("*").alias("tot_at")
    )
    desc_cum = (
        Window.partitionBy("cls")
        .orderBy(F.desc("s_fp"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cuts = (
        g.select(
            "cls",
            "s_fp",
            "pos_at",
            F.sum("tot_at").over(desc_cum).alias("cum_tot"),
        )
        .groupBy("cls")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("cum_tot") >= NDCG_K, F.col("s_fp"))),
                F.min("s_fp"),
            ).alias("cut"),
            F.sum("pos_at").alias("n_pos"),
        )
    )
    disc = F.array(*[F.lit(d) for d in _NDCG_DISCOUNTS_E6])
    idcg = F.array(*[F.lit(p) for p in _NDCG_IDCG_E6])
    rank_w = Window.partitionBy("cls").orderBy(
        F.desc("s_fp"), F.asc("vec_id")
    )
    topk = (
        scored.join(F.broadcast(cuts), "cls")
        .filter(F.col("s_fp") >= F.col("cut"))
        .withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= NDCG_K)
    )
    return (
        topk.groupBy("cls")
        .agg(
            F.first("n_pos").alias("n_pos"),
            F.sum(
                F.col("pos") * F.element_at(disc, F.col("rn").cast("int"))
            ).alias("dcg_e6"),
        )
        .select(
            "cls",
            "n_pos",
            "dcg_e6",
            F.expr(
                f"(1000000 * dcg_e6) DIV element_at("
                f"array({','.join(str(p) for p in _NDCG_IDCG_E6)}), "
                f"CAST(least({NDCG_K}, n_pos) AS INT))"
            ).alias("ndcg_e6"),
        )
    )


_NDCG_DISC_SQL = "[" + ",".join(str(d) for d in _NDCG_DISCOUNTS_E6) + "]"
_NDCG_IDCG_SQL = "[" + ",".join(str(p) for p in _NDCG_IDCG_E6) + "]"

NDCG_AT_K_SQL = f"""
WITH classes AS (
  SELECT unnest(range({N_CLASSES})) AS cls
), scored AS (
  SELECT e.vec_id, c.cls,
         CAST(floor(CAST(e.embedding[c.cls + 1] AS DOUBLE) * {SCORE_SCALE})
              AS BIGINT) AS s_fp,
         CASE WHEN e.label = c.cls THEN 1 ELSE 0 END AS pos
  FROM embeddings e CROSS JOIN classes c
), npos AS (
  SELECT cls, CAST(sum(pos) AS BIGINT) AS n_pos FROM scored GROUP BY cls
), ranked AS (
  SELECT cls, pos,
         row_number() OVER (PARTITION BY cls
                            ORDER BY s_fp DESC, vec_id ASC) AS rn
  FROM scored
), dcg AS (
  SELECT cls,
         CAST(sum(pos * {_NDCG_DISC_SQL}[CAST(rn AS INT)]) AS BIGINT)
           AS dcg_e6
  FROM ranked WHERE rn <= {NDCG_K} GROUP BY cls
)
SELECT d.cls, n.n_pos, d.dcg_e6,
       (1000000 * d.dcg_e6)
         // {_NDCG_IDCG_SQL}[CAST(least({NDCG_K}, n.n_pos) AS INT)]
         AS ndcg_e6
FROM dcg d JOIN npos n ON n.cls = d.cls
"""


ECE_BINS = 10


def calibration_ece(spark: SparkSession, sf: str) -> DataFrame:
    """One-vs-rest expected + maximum calibration error per class over
    the shared score fixture — the reliability-diagram summary (Guo et
    al., ICML'17) completing the scorer-evaluation family: AUC/KS rank
    separation, AP/nDCG/MRR ranking quality, and now "do the scores
    MEAN what they claim". Confidence is the declared affine map of
    the score onto [0,1] (components are unit-norm-bounded in [-1,1]);
    relevance is ``label == c``; B equal-width confidence bins.

    Exact integer spec (no float anywhere): on the half-microunit grid
    ``conf_h = s_fp + 1e6 ∈ [0, 2e6]``, a bin's accuracy-vs-confidence
    gap is ``|2e6·n_pos_b − Σconf_h_b| / (2e6·n_b)``, so

    - ``ece_e6 = Σ_b |2e6·n_pos_b − Σconf_h_b| DIV (2·N)``
    - ``mce_e6 = max_b |2e6·n_pos_b − Σconf_h_b| DIV (2·n_b)``

    — BIGINT-exact below ~9e12 rows/class (then DECIMAL(38,0), same
    expressions; the AUC row's standing note).

    Scale: identical posture to ``auc_evaluation`` — fixed ×N_CLASSES
    fanout, ONE map-side-combined groupBy onto the (class, bin) grid
    (B cells per class, not corpus rows), then a B-row-per-class
    aggregate. No windows, no joins.
    """
    emb = load_table(spark, "embeddings", sf)
    scored = emb.select(
        "label",
        F.posexplode(F.slice("embedding", 1, N_CLASSES)).alias("cls", "score"),
    ).select(
        "cls",
        (
            F.floor(F.col("score").cast("double") * SCORE_SCALE).cast("long")
            + SCORE_SCALE
        ).alias("conf_h"),
        (F.col("label") == F.col("cls")).cast("long").alias("pos"),
    )
    binned = scored.select(
        "cls",
        "pos",
        "conf_h",
        F.least(
            F.lit(ECE_BINS - 1),
            F.expr(f"(conf_h * {ECE_BINS}) DIV {2 * SCORE_SCALE}"),
        ).alias("bin"),
    )
    g = binned.groupBy("cls", "bin").agg(
        F.count("*").alias("n_b"),
        F.sum("pos").alias("pos_b"),
        F.sum("conf_h").alias("conf_b"),
    )
    gap = F.abs(2 * SCORE_SCALE * F.col("pos_b") - F.col("conf_b"))
    return (
        g.groupBy("cls")
        .agg(
            F.sum("n_b").alias("n"),
            F.sum(gap).alias("gap_sum"),
            F.max(F.expr(f"abs({2 * SCORE_SCALE} * pos_b - conf_b) DIV (2 * n_b)")).alias(
                "mce_e6"
            ),
        )
        .select(
            "cls",
            "n",
            F.expr("gap_sum DIV (2 * n)").alias("ece_e6"),
            "mce_e6",
        )
    )


CALIBRATION_ECE_SQL = f"""
WITH classes AS (
  SELECT unnest(range({N_CLASSES})) AS cls
), scored AS (
  SELECT c.cls,
         CAST(floor(CAST(e.embedding[c.cls + 1] AS DOUBLE) * {SCORE_SCALE})
              AS BIGINT) + {SCORE_SCALE} AS conf_h,
         CASE WHEN e.label = c.cls THEN 1 ELSE 0 END AS pos
  FROM embeddings e CROSS JOIN classes c
), binned AS (
  SELECT cls, pos, conf_h,
         least({ECE_BINS - 1}, (conf_h * {ECE_BINS}) // {2 * SCORE_SCALE})
           AS bin
  FROM scored
), g AS (
  SELECT cls, bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(pos) AS BIGINT) AS pos_b,
         CAST(sum(conf_h) AS BIGINT) AS conf_b
  FROM binned GROUP BY 1, 2
)
SELECT cls,
       CAST(sum(n_b) AS BIGINT) AS n,
       CAST(sum(abs({2 * SCORE_SCALE} * pos_b - conf_b)) AS BIGINT)
         // (2 * CAST(sum(n_b) AS BIGINT)) AS ece_e6,
       CAST(max(abs({2 * SCORE_SCALE} * pos_b - conf_b) // (2 * n_b))
            AS BIGINT) AS mce_e6
FROM g GROUP BY cls
"""


CONFORMAL_ALPHA_E3 = 100  # target miscoverage 10%, as integer permil


def conformal_threshold(spark: SparkSession, sf: str) -> DataFrame:
    """Split-conformal calibration per class over the shared score
    fixture (Vovk et al.; Angelopoulos & Bates '21 tutorial form): for
    class c, nonconformity of a positive example is ``−score``; the
    conformal threshold is the ``⌈(n_pos+1)(1−α)⌉``-th smallest
    nonconformity — i.e. the k-th LARGEST positive score with
    ``k = n_pos + 1 − ⌈(n_pos+1)(1−α)⌉`` from the top... equivalently
    the smallest score grid cell q such that at least
    ``⌈(n_pos+1)(1−α)⌉`` positives score ≥ q. Predicting "c ∈ set iff
    score_c ≥ q_c" then covers fresh positives with probability
    ≥ 1−α (exchangeability) — the selective-prediction knob a
    filtering pipeline turns instead of an arbitrary 0.5.

    Exact integer spec: rank arithmetic only — ``need =
    ⌈(n_pos+1)·(1000−α_e3)/1000⌉`` in permil, and the threshold is
    the MAX s_fp with ``cum_pos ≥ need`` on the descending microunit
    grid (ties at the cell boundary included, the conservative
    direction). Outputs the threshold, the exact achieved coverage
    count, and the false-positive admission count at that threshold —
    all BIGINTs plus one e6 ratio pair.

    Scale: the AP/AUC histogram posture — one map-side-combined
    groupBy onto the (class, score_fp) grid, grid-sized windows.
    """
    emb = load_table(spark, "embeddings", sf)
    scored = emb.select(
        "label",
        F.posexplode(F.slice("embedding", 1, N_CLASSES)).alias("cls", "score"),
    ).select(
        "cls",
        F.floor(F.col("score").cast("double") * SCORE_SCALE)
        .cast("long")
        .alias("s_fp"),
        (F.col("label") == F.col("cls")).cast("long").alias("pos"),
    )
    g = scored.groupBy("cls", "s_fp").agg(
        F.sum("pos").alias("pos_at"),
        (F.count("*") - F.sum("pos")).alias("neg_at"),
    )
    desc_cum = (
        Window.partitionBy("cls")
        .orderBy(F.desc("s_fp"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = g.select(
        "cls",
        "s_fp",
        F.sum("pos_at").over(desc_cum).alias("cum_pos"),
        F.sum("neg_at").over(desc_cum).alias("cum_neg"),
        F.sum("pos_at").over(Window.partitionBy("cls")).alias("n_pos"),
    )
    # ceil(a/b) as (a + b − 1) DIV b with all-positive operands —
    # negative-division tricks diverge (Spark DIV truncates toward
    # zero, DuckDB // floors); positive operands are engine-identical
    need = F.expr(
        f"((n_pos + 1) * (1000 - {CONFORMAL_ALPHA_E3}) + 999) DIV 1000"
    )
    return (
        cum.withColumn("need", need)
        .filter(F.col("cum_pos") >= F.col("need"))
        .groupBy("cls")
        .agg(
            F.first("n_pos").alias("n_pos"),
            F.first("need").alias("need"),
            F.max("s_fp").alias("threshold_fp"),
        )
        .join(
            cum.select("cls", "s_fp", "cum_pos", "cum_neg"),
            ["cls"],
        )
        .filter(F.col("s_fp") == F.col("threshold_fp"))
        .select(
            "cls",
            "n_pos",
            "need",
            "threshold_fp",
            F.col("cum_pos").alias("covered_pos"),
            F.col("cum_neg").alias("admitted_neg"),
            F.expr("(1000000 * cum_pos) DIV n_pos").alias("coverage_e6"),
        )
    )


CONFORMAL_THRESHOLD_SQL = f"""
WITH classes AS (
  SELECT unnest(range({N_CLASSES})) AS cls
), scored AS (
  SELECT c.cls,
         CAST(floor(CAST(e.embedding[c.cls + 1] AS DOUBLE) * {SCORE_SCALE})
              AS BIGINT) AS s_fp,
         CASE WHEN e.label = c.cls THEN 1 ELSE 0 END AS pos
  FROM embeddings e CROSS JOIN classes c
), g AS (
  SELECT cls, s_fp,
         CAST(sum(pos) AS BIGINT) AS pos_at,
         CAST(count(*) - sum(pos) AS BIGINT) AS neg_at
  FROM scored GROUP BY 1, 2
), cum AS (
  SELECT cls, s_fp,
         CAST(sum(pos_at) OVER w AS BIGINT) AS cum_pos,
         CAST(sum(neg_at) OVER w AS BIGINT) AS cum_neg,
         CAST(sum(pos_at) OVER (PARTITION BY cls) AS BIGINT) AS n_pos
  FROM g
  WINDOW w AS (PARTITION BY cls ORDER BY s_fp DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), th AS (
  SELECT cls,
         max(n_pos) AS n_pos,
         max(((n_pos + 1) * (1000 - {CONFORMAL_ALPHA_E3}) + 999) // 1000)
           AS need,
         max(s_fp) FILTER (
           WHERE cum_pos >= ((n_pos + 1) * (1000 - {CONFORMAL_ALPHA_E3})
                             + 999) // 1000
         ) AS threshold_fp
  FROM cum GROUP BY cls
)
SELECT t.cls, t.n_pos, t.need, t.threshold_fp,
       c.cum_pos AS covered_pos,
       c.cum_neg AS admitted_neg,
       (1000000 * c.cum_pos) // t.n_pos AS coverage_e6
FROM th t JOIN cum c ON c.cls = t.cls AND c.s_fp = t.threshold_fp
"""


FAIRNESS_THRESHOLD_FP = 150_000  # decision rule: score >= 0.15


def fairness_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Group-fairness audit of a fixed decision rule over the shared
    score fixture: treating class-0's score as "the model" and each
    vector's LABEL as its (sensitive) group, report per group the
    selection rate and the true/false positive rates at the declared
    threshold, plus each group's gap to the all-corpus reference rate
    — the demographic-parity and equalized-odds readouts (Hardt et
    al., NeurIPS'16) a data-governance pass runs before shipping a
    filter trained on pipeline scores.

    Exact integer spec: every rate is an e6 fixed-point floor quotient
    of two BIGINT counts; the reference rates are computed over ALL
    groups in the same aggregate, and each gap is the SIGNED e6
    difference (integer subtraction of already-floored quotients —
    pinned, no cross-engine float). Groups with no positives/negatives
    emit NULL rate and NULL gap on both engines.

    Scale: one ×1 projection of the corpus (no explode — only class
    0's score is read), one map-side-combined groupBy onto the group
    grid, one broadcast-sized reference join. No windows.
    """
    emb = load_table(spark, "embeddings", sf)
    scored = emb.select(
        F.col("label").alias("grp"),
        (
            F.floor(
                F.element_at("embedding", 1).cast("double") * SCORE_SCALE
            ).cast("long")
            >= FAIRNESS_THRESHOLD_FP
        )
        .cast("long")
        .alias("sel"),
        (F.col("label") == 0).cast("long").alias("y"),
    )
    per = scored.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("sel").alias("n_sel"),
        F.sum(F.col("sel") * F.col("y")).alias("tp"),
        F.sum("y").alias("n_pos"),
        F.sum(F.col("sel") * (1 - F.col("y"))).alias("fp"),
        (F.count("*") - F.sum("y")).alias("n_neg"),
    )
    ref = scored.agg(
        F.expr("(1000000 * sum(sel)) DIV count(*)").alias("ref_sel_e6"),
        F.expr("(1000000 * sum(sel * y)) DIV sum(y)").alias("ref_tpr_e6"),
        F.expr(
            "(1000000 * sum(sel * (1 - y))) DIV (count(*) - sum(y))"
        ).alias("ref_fpr_e6"),
    )
    rate = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.expr(f"(1000000 * {num}) DIV {den}")
    )
    return (
        per.crossJoin(F.broadcast(ref))
        .select(
            "grp",
            "n",
            rate("n_sel", "n").cast("long").alias("sel_rate_e6"),
            rate("tp", "n_pos").cast("long").alias("tpr_e6"),
            rate("fp", "n_neg").cast("long").alias("fpr_e6"),
            (rate("n_sel", "n") - F.col("ref_sel_e6"))
            .cast("long")
            .alias("dp_gap_e6"),
            (rate("tp", "n_pos") - F.col("ref_tpr_e6"))
            .cast("long")
            .alias("tpr_gap_e6"),
            (rate("fp", "n_neg") - F.col("ref_fpr_e6"))
            .cast("long")
            .alias("fpr_gap_e6"),
        )
    )


FAIRNESS_GAPS_SQL = f"""
WITH scored AS (
  SELECT label AS grp,
         CASE WHEN CAST(floor(CAST(embedding[1] AS DOUBLE) * {SCORE_SCALE})
                        AS BIGINT) >= {FAIRNESS_THRESHOLD_FP}
              THEN 1 ELSE 0 END AS sel,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
  FROM embeddings
), per AS (
  SELECT grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(sel) AS BIGINT) AS n_sel,
         CAST(sum(sel * y) AS BIGINT) AS tp,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(sel * (1 - y)) AS BIGINT) AS fp,
         CAST(count(*) - sum(y) AS BIGINT) AS n_neg
  FROM scored GROUP BY grp
), ref AS (
  SELECT (1000000 * CAST(sum(sel) AS BIGINT)) // count(*) AS ref_sel_e6,
         (1000000 * CAST(sum(sel * y) AS BIGINT)) // sum(y) AS ref_tpr_e6,
         (1000000 * CAST(sum(sel * (1 - y)) AS BIGINT))
           // (count(*) - sum(y)) AS ref_fpr_e6
  FROM scored
)
SELECT grp, n,
       CAST(CASE WHEN n > 0 THEN (1000000 * n_sel) // n END AS BIGINT)
         AS sel_rate_e6,
       CAST(CASE WHEN n_pos > 0 THEN (1000000 * tp) // n_pos END AS BIGINT)
         AS tpr_e6,
       CAST(CASE WHEN n_neg > 0 THEN (1000000 * fp) // n_neg END AS BIGINT)
         AS fpr_e6,
       CAST(CASE WHEN n > 0 THEN (1000000 * n_sel) // n - ref_sel_e6 END
            AS BIGINT) AS dp_gap_e6,
       CAST(CASE WHEN n_pos > 0 THEN (1000000 * tp) // n_pos - ref_tpr_e6 END
            AS BIGINT) AS tpr_gap_e6,
       CAST(CASE WHEN n_neg > 0 THEN (1000000 * fp) // n_neg - ref_fpr_e6 END
            AS BIGINT) AS fpr_gap_e6
FROM per CROSS JOIN ref
"""


CUPED_CUT_DAY = 15  # pre-period = days 1-15, post = 16+


def cuped_adjustment(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013) for the
    ``ab_test_report`` experiment (arms = user_id mod 2): per-user
    PRE-period value (days 1–15) is the covariate X, POST-period
    value the metric Y; θ = cov(X,Y)/var(X) pooled across arms, and
    each arm reports its raw and CUPED-adjusted means plus the realized
    variance-reduction ratio var(Y−θX)/var(Y) — the readout that says
    how much experiment runtime the covariate buys.

    Determinism: per-user X/Y are exact integer cents (users active in
    either period, absent-period sums coalesced to 0); every co-moment
    (Σx, Σy, Σxy, Σx², Σy², n) is an exact BIGINT per arm; θ and the
    final means/ratios are the ONLY float steps — ratios of identical
    integers on both engines, rounded at 6 (adjusted variance expands
    algebraically to the co-moments: var(Y−θX) = var(Y) − 2θ·cov(X,Y)
    + θ²·var(X), so no per-user second pass exists).

    Scale: one corpus shuffle onto the (user, arm) grid (map-side
    combined conditional sums), then an arm-level reduce of five
    co-moments — 2 rows out. Int64-exact while Σ|xy| < ~9e18 (cents ×
    cents × users); DECIMAL(38,0) beyond, same expressions.
    """
    events = load_table(spark, "events", sf)
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = (
        events.select(
            (F.col("user_id") % 2).alias("arm"),
            "user_id",
            F.when(F.dayofmonth("ts") <= CUPED_CUT_DAY, cents)
            .otherwise(F.lit(0))
            .alias("x"),
            F.when(F.dayofmonth("ts") > CUPED_CUT_DAY, cents)
            .otherwise(F.lit(0))
            .alias("y"),
        )
        .groupBy("arm", "user_id")
        .agg(F.sum("x").alias("x"), F.sum("y").alias("y"))
    )
    arm_mo = per_user.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    pooled = arm_mo.agg(
        F.sum("n").alias("pn"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxy").alias("psxy"),
        F.sum("sxx").alias("psxx"),
    )
    j = arm_mo.crossJoin(F.broadcast(pooled))
    pn = F.col("pn").cast("double")
    theta = (
        pn * F.col("psxy") - F.col("psx") * F.col("psy")
    ) / (pn * F.col("psxx") - F.col("psx") * F.col("psx"))
    n = F.col("n").cast("double")
    mean_x, mean_y = F.col("sx") / n, F.col("sy") / n
    pooled_mean_x = F.col("psx") / pn
    var_y = F.col("syy") / n - mean_y * mean_y
    var_x = F.col("sxx") / n - mean_x * mean_x
    cov = F.col("sxy") / n - mean_x * mean_y
    var_adj = var_y - 2 * theta * cov + theta * theta * var_x
    return j.select(
        "arm",
        F.col("n").alias("n_users"),
        F.round(theta * 1e6, 0).cast("long").alias("theta_e6"),
        F.round(mean_y, 6).alias("mean_y"),
        F.round(mean_y - theta * (mean_x - pooled_mean_x), 6).alias(
            "mean_y_adj"
        ),
        F.round(F.when(var_y > 0, var_adj / var_y), 6).alias(
            "var_reduction"
        ),
    )


CUPED_ADJUSTMENT_SQL = f"""
WITH per_user AS (
  SELECT user_id % 2 AS arm, user_id,
         CAST(sum(CASE WHEN day(ts) <= {CUPED_CUT_DAY}
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN day(ts) > {CUPED_CUT_DAY}
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), arm_mo AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM per_user GROUP BY arm
), pooled AS (
  SELECT CAST(sum(n) AS BIGINT) AS pn, CAST(sum(sx) AS BIGINT) AS psx,
         CAST(sum(sy) AS BIGINT) AS psy,
         CAST(sum(sxy) AS BIGINT) AS psxy,
         CAST(sum(sxx) AS BIGINT) AS psxx
  FROM arm_mo
), j AS (
  SELECT a.*, p.*,
         (CAST(p.pn AS DOUBLE) * p.psxy - CAST(p.psx AS DOUBLE) * p.psy)
           / (CAST(p.pn AS DOUBLE) * p.psxx
              - CAST(p.psx AS DOUBLE) * p.psx) AS theta
  FROM arm_mo a CROSS JOIN pooled p
)
SELECT arm, n AS n_users,
       CAST(round(theta * 1e6, 0) AS BIGINT) AS theta_e6,
       round(CAST(sy AS DOUBLE) / n, 6) AS mean_y,
       round(CAST(sy AS DOUBLE) / n
             - theta * (CAST(sx AS DOUBLE) / n
                        - CAST(psx AS DOUBLE) / pn), 6) AS mean_y_adj,
       round(CASE WHEN CAST(syy AS DOUBLE) / n
                       - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)
                       > 0 THEN
         (CAST(syy AS DOUBLE) / n
            - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)
          - 2 * theta * (CAST(sxy AS DOUBLE) / n
                         - (CAST(sx AS DOUBLE) / n)
                           * (CAST(sy AS DOUBLE) / n))
          + theta * theta * (CAST(sxx AS DOUBLE) / n
                             - (CAST(sx AS DOUBLE) / n)
                               * (CAST(sx AS DOUBLE) / n)))
         / (CAST(syy AS DOUBLE) / n
            - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
       END, 6) AS var_reduction
FROM j
"""


ML_EVAL_QUERIES = {
    "ab_test_report": (ab_test_report, AB_TEST_REPORT_SQL),
    "cuped_adjustment": (cuped_adjustment, CUPED_ADJUSTMENT_SQL),
    "average_precision": (average_precision, AVERAGE_PRECISION_SQL),
    "ndcg_at_k": (ndcg_at_k, NDCG_AT_K_SQL),
    "calibration_ece": (calibration_ece, CALIBRATION_ECE_SQL),
    "conformal_threshold": (conformal_threshold, CONFORMAL_THRESHOLD_SQL),
    "fairness_gaps": (fairness_gaps, FAIRNESS_GAPS_SQL),
    "auc_evaluation": (auc_evaluation, AUC_EVALUATION_SQL),
    "ks_score_separation": (ks_score_separation, KS_SCORE_SEPARATION_SQL),
    "tree_split_finder": (tree_split_finder, TREE_SPLIT_FINDER_SQL),
    "target_encode_oof": (target_encode_oof, TARGET_ENCODE_OOF_SQL),
}
