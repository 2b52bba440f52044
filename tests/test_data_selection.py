"""Data-selection plans (plans/data_selection.py): DSIR importance
resampling + C4 cleaning rules."""

from __future__ import annotations

import math

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.data_selection import (
    C4_MIN_LINES_PER_PAGE,
    DSIR_BUCKETS,
    DSIR_TARGET_LANG,
    DSIR_TOP_K,
    _DUCK_TOKEN_FP,
    c4_line_filter,
    dsir_select,
)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_dsir_quantization_margin(sf):
    """The ONLY float step is round(1e6 * ln(ratio)) per bucket, from
    identical integer counts on both engines.  A 1-ulp ln() difference
    between libm and the JVM can flip the round only if the value sits
    within ~1e-9 of the half-integer grid; pin a 1e-5 margin on the
    driver datasets so engine parity is guaranteed, not probabilistic."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    rows = con.sql(f"""
      WITH tok AS (
        SELECT lang, unnest(string_split(trim(text), ' ')) AS token
        FROM documents
      ), htok AS (
        SELECT lang, ({_DUCK_TOKEN_FP}) % {DSIR_BUCKETS} AS h FROM tok
      ), buckets AS (
        SELECT h, COUNT(*) AS raw_h,
               SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
                 AS tgt_h
        FROM htok GROUP BY h
      ), tot AS (SELECT SUM(raw_h) AS raw_n, SUM(tgt_h) AS tgt_n FROM buckets)
      SELECT tgt_h, raw_h, raw_n, tgt_n FROM buckets, tot
    """).fetchall()
    assert rows
    for tgt_h, raw_h, raw_n, tgt_n in rows:
        v = 1e6 * math.log(
            ((tgt_h + 1) * (raw_n + DSIR_BUCKETS))
            / ((raw_h + 1) * (tgt_n + DSIR_BUCKETS))
        )
        frac = abs(v - math.floor(v) - 0.5)
        assert frac > 1e-5, f"bucket value {v} sits on the rounding half-grid"


def test_dsir_selects_target_stratum(spark, sf_dir):
    rows = dsir_select(spark, sf_dir).collect()
    assert len(rows) == min(DSIR_TOP_K, 500)
    # weights sorted desc with doc_id tiebreak
    keys = [(-r.weight_micro, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    # the selection must enrich the target language over its base rate
    # (the synthetic corpus shares ONE vocabulary across languages, so
    # only frequency-profile signal exists — enrichment is the bar, not
    # separation; measured: 0.52 vs 0.386 base at sf0.001, 0.68 vs
    # 0.436 at sf0.01 for the top 50)
    import duckdb

    con = duckdb.connect()
    base = con.sql(
        f"SELECT avg(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1.0 ELSE 0 END)"
        f" FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    top = rows[:50]
    frac_en = sum(r.lang == DSIR_TARGET_LANG for r in top) / len(top)
    assert frac_en >= base + 0.08, f"target fraction {frac_en} vs base {base}"


def test_c4_rules(spark, sf_dir):
    rows = c4_line_filter(spark, sf_dir).collect()
    assert rows
    byid = {r.doc_id: r for r in rows}
    for r in rows:
        if r.doc_id % 41 == 0:
            assert r.verdict == "lorem_ipsum"
        elif r.doc_id % 43 == 0:
            assert r.verdict == "brace"
        else:
            assert r.verdict in ("kept", "too_few_lines")
            if r.verdict == "kept":
                assert r.n_kept_lines >= C4_MIN_LINES_PER_PAGE
        assert 0 <= r.n_kept_lines <= r.n_lines
    # both the punctuation rule and the short-line rule must actually
    # drop lines somewhere in the corpus
    assert any(r.n_kept_lines < r.n_lines for r in rows)
    assert any(r.verdict == "kept" for r in rows)
