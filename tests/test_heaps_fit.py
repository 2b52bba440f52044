"""heaps_fit: analytic corpora (all-distinct tokens -> beta = 1 with
r2 = 1; closed one-token vocabulary -> zero-variance NULL r2), plus an
independent numpy least-squares reference over the real testdata's
prefix curve.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.text import (
    heaps_fit,
)

SF = "/root/testdata/sf0.001"


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(path / "documents.parquet"))
    return str(path)


def test_all_distinct_tokens_give_beta_one(spark, tmp_path_factory):
    # every token unique corpus-wide -> V(n) = n exactly at every prefix
    sf = _write_docs(
        spark,
        tmp_path_factory.mktemp("heaps_b1"),
        ["t01 t02 t03", "t04 t05", "t06 t07 t08 t09"],
    )
    rows = heaps_fit(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_docs"], r["slope"], r["intercept"], r["r2"]) == (3, 1.0, 0.0, 1.0)


def test_closed_vocabulary_gives_null_r2(spark, tmp_path_factory):
    # one token type everywhere -> V = 1 at every prefix (zero variance)
    sf = _write_docs(
        spark,
        tmp_path_factory.mktemp("heaps_b0"),
        ["x x x", "x x", "x"],
    )
    rows = heaps_fit(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["slope"] == 0.0
    assert r["r2"] is None


def test_heaps_matches_numpy_reference(spark, sf_dir):
    con = duckdb.connect()
    base = con.sql(
        "SELECT lang, doc_id, string_split(trim(text), ' ')"
        f" FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    per_lang: dict[str, list[tuple[int, list[str]]]] = {}
    for lang, doc_id, toks in base:
        per_lang.setdefault(lang, []).append((doc_id, toks))
    rows = {r["lang"]: r for r in heaps_fit(spark, SF).collect()}
    for lang, docs in per_lang.items():
        seen: set[str] = set()
        xs, ys = [], []
        n_tok = 0
        for doc_id, toks in sorted(docs):
            n_tok += len(toks)
            seen.update(toks)
            xs.append(math.log(n_tok))
            ys.append(math.log(len(seen)))
        if len(xs) < 3:
            assert lang not in rows
            continue
        slope, intercept = np.polyfit(xs, ys, 1)
        r = rows[lang]
        assert r["n_docs"] == len(xs)
        assert math.isclose(r["slope"], slope, abs_tol=1e-4)
        assert math.isclose(r["intercept"], intercept, abs_tol=1e-4)
        # natural-ish corpus: sub-linear vocabulary growth
        assert 0 < r["slope"] < 1
