"""Benford first-digit audit (plans/stats.py) — direct recomputation
plus the constant-table invariants."""

from __future__ import annotations

import math

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.stats import (
    BENFORD_E6,
    benford_audit,
)

SF = "/root/testdata/sf0.001"


def test_benford_constants_are_the_law():
    for d, e in BENFORD_E6.items():
        assert e == round(math.log10(1 + 1 / d) * 1_000_000)
    assert sum(BENFORD_E6.values()) == 1_000_000


def test_benford_audit_matches_direct(spark):
    rows = benford_audit(spark, SF).collect()
    base = duckdb.sql(
        f"SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    hist: dict[tuple[str, int], int] = {}
    grp: dict[str, int] = {}
    for pri, cents in base:
        d = int(str(cents)[0])
        hist[(pri, d)] = hist.get((pri, d), 0) + 1
        grp[pri] = grp.get(pri, 0) + 1
    assert len(rows) == len(hist)
    tvd: dict[str, int] = {}
    for (pri, d), n in hist.items():
        obs = (1_000_000 * n) // grp[pri]
        tvd[pri] = tvd.get(pri, 0) + abs(obs - BENFORD_E6[d])
    for r in rows:
        n = hist[(r["priority"], r["digit"])]
        obs = (1_000_000 * n) // grp[r["priority"]]
        assert r["n_obs"] == n
        assert r["obs_e6"] == obs
        assert r["expected_e6"] == BENFORD_E6[r["digit"]]
        assert r["dev_e6"] == abs(obs - BENFORD_E6[r["digit"]])
        assert r["tvd_e6"] == tvd[r["priority"]] // 2
