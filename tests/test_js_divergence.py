"""js_divergence_sources: crafted corpora pinning the two analytic
extremes (identical distributions -> 0, disjoint vocabularies -> ln 2)
plus an independent dense-walk second implementation on real testdata.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.text import (
    js_divergence_sources,
)

SF = "/root/testdata/sf0.001"

LN2 = math.log(2.0)


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i + 1, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(path / "documents.parquet"))
    return str(path)


def test_identical_distributions_give_zero(spark, tmp_path_factory):
    sf = _write_docs(
        spark,
        tmp_path_factory.mktemp("jsd_same"),
        [("a", "x y z x"), ("b", "x y z x")],
    )
    rows = {r["source"]: r["jsd"] for r in
            js_divergence_sources(spark, sf).collect()}
    assert rows == {"a": 0.0, "b": 0.0}


def test_disjoint_vocabularies_give_ln2(spark, tmp_path_factory):
    sf = _write_docs(
        spark,
        tmp_path_factory.mktemp("jsd_disjoint"),
        [("a", "x x y"), ("b", "u v w")],
    )
    rows = {r["source"]: r["jsd"] for r in
            js_divergence_sources(spark, sf).collect()}
    assert rows == {"a": round(LN2, 6), "b": round(LN2, 6)}


def test_jsd_matches_dense_python_walk(spark, sf_dir):
    con = duckdb.connect()
    base = con.sql(
        "SELECT source, unnest(string_split(trim(text), ' '))"
        f" FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    per_src: dict[str, Counter] = {}
    for s, t in base:
        per_src.setdefault(s, Counter())[t] += 1
    gcnt: Counter = Counter()
    for c in per_src.values():
        gcnt.update(c)
    n_all = sum(gcnt.values())
    rows = {r["source"]: r for r in
            js_divergence_sources(spark, SF).collect()}
    assert set(rows) == set(per_src)
    for s, cnt in per_src.items():
        n_s = sum(cnt.values())
        jsd = 0.0
        for term, g in gcnt.items():
            p = cnt.get(term, 0) / n_s
            q = (g - cnt.get(term, 0)) / (n_all - n_s)
            m = (p + q) / 2
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            if q > 0:
                jsd += 0.5 * q * math.log(q / m)
        r = rows[s]
        assert r["n_tokens"] == n_s
        assert math.isclose(r["jsd"], jsd, abs_tol=2e-6)
        assert 0 <= r["jsd"] <= LN2 + 1e-9
