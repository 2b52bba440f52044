"""gopher_quality_rules: full Python second implementation of the
battery (including the deterministic symbol-injection residues) over
the real testdata, plus an assertion that every rule column
discriminates (no vacuously-constant rule).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.data_selection import (
    _GOPHER_HEAVY_RESIDUE,
    _GOPHER_STOPWORDS,
    _GOPHER_SYMBOL_RESIDUE,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_WORDS,
    gopher_quality_rules,
)

SF = "/root/testdata/sf0.001"


def _reference(doc_id: int, text: str) -> dict:
    toks = text.strip().split(" ")
    n_base = len(toks)
    if doc_id % _GOPHER_HEAVY_RESIDUE == 0:
        n_sym = 2 * n_base
    elif doc_id % _GOPHER_SYMBOL_RESIDUE == 0:
        n_sym = math.ceil(n_base / 8)
    else:
        n_sym = 0
    n_words = n_base + n_sym
    sum_len = sum(len(t) for t in toks) + n_sym
    n_alpha = sum(1 for t in toks if any(c.isalpha() for c in t))
    n_stop = len(set(toks) & set(_GOPHER_STOPWORDS))
    r = {
        "n_words": n_words,
        "r_word_count": GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS,
        "r_mean_word_len": 3000 * n_words <= 1000 * sum_len <= 10000 * n_words,
        "r_alpha_words": 10 * n_alpha >= 8 * n_words,
        "r_symbol_ratio": 10 * n_sym <= n_words,
        "r_stopwords": n_stop >= 2,
    }
    r["keep"] = all(
        r[k] for k in r if k.startswith("r_")
    )
    return r


def test_gopher_matches_python_reference(spark, sf_dir):
    con = duckdb.connect()
    base = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    rows = {r["doc_id"]: r.asDict() for r in
            gopher_quality_rules(spark, SF).collect()}
    assert set(rows) == {d for d, _ in base}
    for doc_id, text in base:
        want = _reference(doc_id, text)
        got = rows[doc_id]
        for k, v in want.items():
            assert got[k] == v, (doc_id, k, got[k], v)


def test_every_rule_discriminates(spark, sf_dir):
    """No rule column may be vacuously constant on the corpus — the
    injection residues exist precisely to exercise the symbol/alpha/
    length rules the symbol-free synthetic text would never trip."""
    rows = gopher_quality_rules(spark, SF).collect()
    for col in (
        "r_word_count",
        "r_mean_word_len",
        "r_alpha_words",
        "r_symbol_ratio",
        "r_stopwords",
        "keep",
    ):
        vals = {bool(r[col]) for r in rows}
        assert vals == {True, False}, f"{col} is constant: {vals}"
