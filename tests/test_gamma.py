"""Goodman-Kruskal gamma (plans/stats.py::hour_value_gamma): the 2D
prefix-sum concordance counts must equal the O(n²) pair enumeration —
the honest quadratic truth the grid form replaces."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.stats import (
    GAMMA_BIN_MAX,
    GAMMA_BIN_W,
    hour_value_gamma,
)

SF = "/root/testdata/sf0.001"


def test_gamma_matches_quadratic_pair_count(spark):
    got = {r["event_type"]: r for r in hour_value_gamma(spark, SF).collect()}
    base = duckdb.sql(
        f"""SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT),
                   CAST(least({GAMMA_BIN_MAX}, floor(value / {GAMMA_BIN_W}))
                        AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    by: dict[str, list[tuple[int, int]]] = {}
    for et, h, b in base:
        by.setdefault(et, []).append((h, b))
    for et, pts in by.items():
        conc = disc = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dh = pts[i][0] - pts[j][0]
                db = pts[i][1] - pts[j][1]
                if dh * db > 0:
                    conc += 1
                elif dh * db < 0:
                    disc += 1
        r = got[et]
        assert r["n"] == len(pts)
        assert (r["concordant"], r["discordant"]) == (conc, disc), et
        sign = (conc > disc) - (conc < disc)
        want = (
            0
            if conc + disc == 0
            else sign * ((1_000_000 * abs(conc - disc)) // (conc + disc))
        )
        assert r["gamma_e6"] == want
        assert -1_000_000 <= r["gamma_e6"] <= 1_000_000
