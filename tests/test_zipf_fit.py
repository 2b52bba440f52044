"""zipf_fit: crafted corpus with exactly Zipfian token frequencies
(freq = 840/rank, so ln-freq on ln-rank is a perfect line of slope −1)
plus an independent numpy least-squares reference on the real testdata.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.text import (
    ZIPF_TOP_R,
    zipf_fit,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def crafted_sf(spark, tmp_path_factory):
    sf = tmp_path_factory.mktemp("zipf_sf")
    # 8 token types; type r appears exactly 840/r times (integers for
    # every r in 1..8) -> perfect power law with exponent -1.
    toks = []
    for r in range(1, 9):
        toks += [f"tok{r:02d}"] * (840 // r)
    text = " ".join(toks)
    spark.createDataFrame(
        [(1, text, "xx", "src", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(sf / "documents.parquet"))
    return str(sf)


def test_zipf_exact_power_law(spark, crafted_sf):
    rows = zipf_fit(spark, crafted_sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["lang"], r["n_terms"]) == ("xx", 8)
    assert r["slope"] == -1.0
    assert r["r2"] == 1.0
    assert math.isclose(r["intercept"], math.log(840.0), abs_tol=1e-6)


def test_zipf_matches_numpy_reference(spark, sf_dir):
    rows = {r["lang"]: r for r in zipf_fit(spark, SF).collect()}
    import duckdb

    con = duckdb.connect()
    base = con.sql(
        "SELECT lang, unnest(string_split(trim(text), ' ')) AS term"
        f" FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    from collections import Counter

    per_lang: dict[str, Counter] = {}
    for lang, term in base:
        per_lang.setdefault(lang, Counter())[term] += 1
    assert set(rows) == {
        lang for lang, c in per_lang.items() if min(len(c), ZIPF_TOP_R) >= 3
    }
    for lang, counts in per_lang.items():
        if lang not in rows:
            continue
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :ZIPF_TOP_R
        ]
        x = np.log(np.arange(1, len(top) + 1, dtype=float))
        y = np.log(np.array([n for _, n in top], dtype=float))
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        r = rows[lang]
        assert r["n_terms"] == len(top)
        assert math.isclose(r["slope"], slope, abs_tol=1e-4)
        assert math.isclose(r["intercept"], intercept, abs_tol=1e-4)
        assert math.isclose(r["r2"], r2, abs_tol=1e-4)
        # rank curve must decay (the synthetic corpus is flatter than
        # natural language, so only the sign is asserted)
        assert r["slope"] < 0
