"""Invariant tests for the training-data pipeline operators
(plans/training_data.py): packing conservation/chunk-exactness, quota
determinism and cap, shard total conservation, quantization error bound.
The DuckDB oracle checks value parity; these check the semantics are
the *right* semantics."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.training_data import (
    N_SHARDS,
    QUOTA_PER_SOURCE,
    SEQ_LEN,
    embedding_quantization,
    sequence_packing,
    shard_assignment,
    source_quota_sample,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def test_sequence_packing_conserves_tokens(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), " "))).alias("t")
    ).first().t
    packed = sequence_packing(spark, sf_dir).collect()
    assert sum(r.n_tok_in_seq for r in packed) == total_tokens
    assert all(1 <= r.n_tok_in_seq <= SEQ_LEN for r in packed)


def test_sequence_packing_full_chunks(spark, sf_dir):
    """Every sequence except the last of each source holds exactly
    SEQ_LEN tokens (concat-and-chunk leaves no padding gaps)."""
    packed = sequence_packing(spark, sf_dir).collect()
    per_seq: dict[tuple, int] = defaultdict(int)
    for r in packed:
        per_seq[(r.source, r.seq_id)] += r.n_tok_in_seq
    last = {}
    for (src, seq), _ in per_seq.items():
        last[src] = max(last.get(src, -1), seq)
    for (src, seq), tok in per_seq.items():
        if seq != last[src]:
            assert tok == SEQ_LEN, (src, seq, tok)
        else:
            assert 1 <= tok <= SEQ_LEN
    # split flags mark exactly the docs appearing in >1 sequence
    seen: dict[int, list] = defaultdict(list)
    for r in packed:
        seen[r.doc_id].append(r.is_split)
    for doc_id, flags in seen.items():
        assert all(f == (len(flags) > 1) for f in flags), doc_id


def test_source_quota_cap_and_determinism(spark, sf_dir):
    out1 = source_quota_sample(spark, sf_dir).collect()
    out2 = source_quota_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    per_src: dict[str, int] = defaultdict(int)
    for r in out1:
        per_src[r.source] += 1
    assert all(n <= QUOTA_PER_SOURCE for n in per_src.values())


def test_shard_assignment_conserves_docs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    out = shard_assignment(spark, sf_dir).collect()
    assert sum(r.n_docs for r in out) == docs.count()
    assert {r.shard for r in out} <= set(range(N_SHARDS))
    # multiplicative hashing keeps the worst shard within 3x mean load
    ratios = [r.load_ratio for r in out]
    assert max(ratios) < 3.0 and min(ratios) > 0.0


def test_embedding_quantization_error_bound(spark, sf_dir):
    """Symmetric int8: reconstruction error is at most scale/2 per
    element (round-half-up), so max_abs_err <= scale_r/2 + rounding."""
    out = embedding_quantization(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.max_abs_err <= r.scale_r / 2 + 1e-6, r
        assert r.q_l1 >= 0


def test_token_budget_floor_and_priority(spark, sf_dir):
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.training_data import (
        TOKEN_BUDGET,
        token_budget_sample,
    )

    out = token_budget_sample(spark, sf_dir).collect()
    per_src: dict[str, list] = defaultdict(list)
    for r in out:
        per_src[r.source].append(r)
    for src, rows in per_src.items():
        total = sum(r.n_tok for r in rows)
        # budget is a floor: dropping the last-admitted doc goes under it
        assert total >= min(TOKEN_BUDGET, total), src
        worst = max(rows, key=lambda r: r.cum_before)
        assert worst.cum_before < TOKEN_BUDGET
        assert total - worst.n_tok < TOKEN_BUDGET, src


def test_quality_weighted_sample_monotone(spark, sf_dir):
    """Keep-rate must rise with quality: in expectation the hash coin
    is uniform, so the kept fraction of the top quality tercile beats
    the bottom tercile; every kept row satisfies coin < keep_below."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.training_data import (
        quality_weighted_sample,
    )
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.functions.text import (
        quality_score,
    )
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    kept = quality_weighted_sample(spark, sf_dir).collect()
    assert kept and all(r.coin < r.keep_below for r in kept)
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", quality_score(F.col("text")).alias("q")
    ).collect()
    qs = sorted(docs, key=lambda r: r.q)
    lo = {r.doc_id for r in qs[: len(qs) // 3]}
    hi = {r.doc_id for r in qs[-len(qs) // 3 :]}
    kept_ids = {r.doc_id for r in kept}
    lo_rate = len(lo & kept_ids) / len(lo)
    hi_rate = len(hi & kept_ids) / len(hi)
    assert hi_rate > lo_rate


def test_lm_cross_entropy_bounds(spark, sf_dir):
    """Unigram cross-entropy is >= corpus-entropy floor per token:
    -ln(p) >= 0 always, and <= ln(total tokens) (a token seen once)."""
    import math

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.text import (
        lm_cross_entropy,
    )

    out = lm_cross_entropy(spark, sf_dir).collect()
    assert out
    n_total = sum(r.n_tok for r in out)
    for r in out:
        assert 0.0 <= r.cross_entropy <= math.log(n_total) + 1e-6, r


def test_selection_order_decorrelated(spark):
    """Composing quality_weighted_sample's coin with the selection-
    order hash (cap/quota/budget) must not bias the capped sample's
    quality: with a SHARED hash the cap's low-priority window overlaps
    the coin (priority < KEEP_SCALE means coin == priority), measured
    as a ~0.005 mean-quality depression. Checked structurally over a
    dense id range with synthetic uniform qualities."""
    from pyspark.sql import functions as F

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.training_data import (
        HASH_P,
        KEEP_SCALE,
        PRIORITY_MULT,
        _sel_priority,
    )

    # k small enough that the cap window sits INSIDE [0, KEEP_SCALE),
    # where the shared-hash coupling is total (coin == priority there):
    # with the old shared hash the capped mean is ~0.042 below the
    # survivor mean at this k; decorrelated it is within ~0.003
    n, k = 400_000, 150
    ids = spark.range(n).withColumnRenamed("id", "doc_id")
    # synthetic quality in [0.3, 1.0] from an unrelated hash
    q = 0.3 + 0.7 * (
        ((F.col("doc_id") % HASH_P) * 104_729 % HASH_P % 10_000) / 10_000.0
    )
    coin = (F.col("doc_id") % HASH_P) * PRIORITY_MULT % HASH_P % KEEP_SCALE
    survivors = ids.select(
        "doc_id", q.alias("q"), _sel_priority().alias("sel")
    ).filter(coin < (q * q * KEEP_SCALE).cast("long"))
    mean_surv = survivors.agg(F.avg("q")).first()[0]
    mean_capped = (
        survivors.orderBy(F.col("sel").asc(), F.col("doc_id").asc())
        .limit(k)
        .agg(F.avg("q"))
        .first()[0]
    )
    # the capped subset's mean quality tracks the survivor mean; the
    # shared-hash bug depressed it by ~2x this tolerance at this k
    assert abs(mean_capped - mean_surv) < 0.02, (mean_capped, mean_surv)
