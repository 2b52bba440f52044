"""Driver-collect guards (VERDICT r9 #3): the token vocabulary is no
longer collected at all (per-task memoized hashing — _hash_tokens must
be bit-identical to the Spark-expression hash the oracle mirrors), and
the one remaining collect (_df_map for prefix ranking) is size-gated
with a distributed fallback pinned result-identical here."""

from __future__ import annotations

import pytest

import real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.dedup as dd
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def test_hash_tokens_matches_spark_expr(spark):
    """_hash_tokens (Python, per-task memo) == _str_hash (Spark
    expression, what the DuckDB oracle mirrors) on representative and
    adversarial tokens."""
    from pyspark.sql import functions as F

    toks = ["table", "join", "", "a", "Ω≈ç√", "x" * 300, "0", " "]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    want = {
        r["token"]: r["h"]
        for r in df.select(
            "token", dd._str_hash(F.col("token")).alias("h")
        ).collect()
    }
    memo: dict = {}
    got = dict(zip(toks, dd._hash_tokens(toks, memo).tolist()))
    assert got == want
    # memo actually amortizes (every distinct token cached)
    assert set(memo) == set(toks)
    # and re-hashing through the warm memo is unchanged
    assert dict(zip(toks, dd._hash_tokens(toks, memo).tolist())) == want


def test_memo_clears_past_bound(monkeypatch):
    monkeypatch.setattr(dd, "VOCAB_MEMO_MAX", 3)
    memo: dict = {}
    dd._hash_tokens([f"t{i}" for i in range(10)], memo)
    # next call sees an over-bound memo and clears it before refilling
    dd._hash_tokens(["fresh"], memo)
    assert len(memo) <= 4 and "fresh" in memo


def test_df_map_gate_and_fallback_identical(spark, sf_dir, monkeypatch):
    """Shut the _df_map gate: _ranked_postings must take the
    distributed df-join + window path and produce identical ranked
    prefixes, and dedup_jaccard_prefix end-to-end must be identical."""
    docs = load_table(spark, "documents", sf_dir)
    doc_sets = dd._shingle_sets(docs)

    def rows(df, cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    open_rows = rows(
        dd._ranked_postings(doc_sets, jaccard_prefix_only=True),
        ["doc_id", "sid", "rk", "n_tri"],
    )
    monkeypatch.setattr(dd, "DF_MAP_MAX", 0)
    assert dd._df_map(doc_sets) is dd.VOCAB_TOO_BIG  # gate is shut
    gated_rows = rows(
        dd._ranked_postings(doc_sets, jaccard_prefix_only=True),
        ["doc_id", "sid", "rk", "n_tri"],
    )
    assert gated_rows == open_rows and open_rows

    gated_q = rows(dd.dedup_jaccard_prefix(spark, sf_dir), ["ia", "ib", "jaccard"])
    monkeypatch.setattr(dd, "DF_MAP_MAX", 10_000_000)
    open_q = rows(dd.dedup_jaccard_prefix(spark, sf_dir), ["ia", "ib", "jaccard"])
    assert gated_q == open_q and open_q


@pytest.mark.parametrize("with_minhash", [False, True])
def test_shingle_sets_no_driver_jobs_needed(spark, sf_dir, with_minhash):
    """The shingle kernels run with zero driver collects: building the
    plan must not launch any job (plan construction is lazy end to
    end now that the vocabulary job is gone)."""
    docs = load_table(spark, "documents", sf_dir)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    dd._shingle_sets(docs, materialize=False, with_minhash=with_minhash)
    dd._shingle_postings(docs, materialize=False)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
