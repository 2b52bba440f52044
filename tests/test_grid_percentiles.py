"""Grid-exact percentiles (plans/relational.py): the histogram form
must equal the sort-based type-1 quantile on the same cents grid."""

from __future__ import annotations

import math

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.relational import (
    grid_exact_percentiles,
)

SF = "/root/testdata/sf0.001"


def test_grid_form_equals_sorted_type1_quantile(spark):
    got = {r["event_type"]: r for r in grid_exact_percentiles(spark, SF).collect()}
    base = duckdb.sql(
        f"SELECT event_type, CAST(round(value * 100) AS BIGINT) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    by: dict[str, list[int]] = {}
    for et, c in base:
        by.setdefault(et, []).append(c)
    for et, vals in by.items():
        vals.sort()
        n = len(vals)
        r = got[et]
        assert r["n"] == n
        for p in (50, 95, 99):
            k = math.ceil(p * n / 100)  # type-1: smallest value with cum >= k
            assert r[f"p{p}_cents"] == vals[k - 1], (et, p)
        # duckdb's quantile_disc agrees with the same spec
        (qd,) = duckdb.sql(
            f"SELECT quantile_disc(c, 0.95) FROM (SELECT unnest(?) AS c)",
            params=[vals],
        ).fetchone()
        assert r["p95_cents"] == qd
