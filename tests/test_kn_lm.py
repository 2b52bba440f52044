"""Discounted bigram LM (plans/text.py::kn_bigram_lm): exact-rational
mass identity and a direct recomputation of the top-K table."""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.text import (
    KN_DISCOUNT4,
    KN_TOP_K,
    kn_bigram_lm,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def counts():
    con = duckdb.connect()
    rows = con.sql(
        f"""WITH toks AS (
              SELECT string_split(trim(text), ' ') AS t
              FROM read_parquet('{SF}/documents.parquet')
            ), bigrams AS (
              SELECT t[i] AS w1, t[i + 1] AS w2
              FROM toks, UNNEST(range(1, len(t))) AS r(i)
            )
            SELECT w1, w2, count(*) FROM bigrams GROUP BY 1, 2"""
    ).fetchall()
    return {(w1, w2): int(c) for w1, w2, c in rows}


def _model(counts):
    ctx_tot: dict[str, int] = {}
    n1p_fw: dict[str, int] = {}
    n1p_bw: dict[str, int] = {}
    for (w1, w2), c in counts.items():
        ctx_tot[w1] = ctx_tot.get(w1, 0) + c
        n1p_fw[w1] = n1p_fw.get(w1, 0) + 1
        n1p_bw[w2] = n1p_bw.get(w2, 0) + 1
    npp = len(counts)
    return ctx_tot, n1p_fw, n1p_bw, npp


def _p_kn(counts, model, w1, w2) -> Fraction:
    ctx_tot, n1p_fw, n1p_bw, npp = model
    c = counts[(w1, w2)]
    return Fraction(
        (4 * c - KN_DISCOUNT4) * npp + KN_DISCOUNT4 * n1p_fw[w1] * n1p_bw[w2],
        4 * ctx_tot[w1] * npp,
    )


def test_kn_mass_sums_to_one_over_observed_continuations(counts):
    """For a context whose observed continuations cover the whole
    continuation vocabulary, the discounted mass plus the redistributed
    mass is EXACTLY 1 in the rationals. For every context, the observed
    mass must stay < 1, leaving backoff headroom for unseen pairs."""
    model = _model(counts)
    _, n1p_fw, n1p_bw, npp = model
    vocab_bw = set(n1p_bw)
    full_ctx = 0
    for w1 in n1p_fw:
        seen = {b for (a, b) in counts if a == w1}
        mass = sum(
            (_p_kn(counts, model, w1, w2) for w2 in seen), Fraction(0)
        )
        if seen == vocab_bw:
            # complete row: discount mass returns exactly through p_cont
            assert mass == 1, (w1, mass)
            full_ctx += 1
        else:
            assert mass < 1, (w1, mass)
    assert full_ctx >= 1, "no complete context row — identity untested"


def test_kn_top_k_matches_direct(spark, counts):
    model = _model(counts)
    rows = kn_bigram_lm(spark, SF).collect()
    ctx_tot, n1p_fw, n1p_bw, npp = model
    by_ctx: dict[str, list] = {}
    for (w1, w2), c in counts.items():
        p = _p_kn(counts, model, w1, w2)
        p_e9 = (1_000_000_000 * p.numerator) // p.denominator
        by_ctx.setdefault(w1, []).append((-p_e9, w2, c, p_e9))
    want = {}
    for w1, lst in by_ctx.items():
        for rank, (_negp, w2, c, p_e9) in enumerate(sorted(lst)[:KN_TOP_K], 1):
            want[(w1, w2)] = (c, p_e9, rank)
    assert len(rows) == len(want)
    for r in rows:
        c, p_e9, rank = want[(r["w1"], r["w2"])]
        assert (r["c"], r["p_kn_e9"], r["rank"]) == (c, p_e9, rank)
        assert r["c_ctx"] == ctx_tot[r["w1"]]
        assert r["n1p_fw"] == n1p_fw[r["w1"]]
        assert r["n1p_bw"] == n1p_bw[r["w2"]]
