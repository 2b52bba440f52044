"""Theil-Sen trend (plans/timeseries.py) and frequent paths
(plans/relational.py) — direct Python recomputation, plus the
conservation identities each query's docstring claims."""

from __future__ import annotations

import datetime
from fractions import Fraction

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.relational import (
    frequent_paths,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
    theil_sen_trend,
)

SF = "/root/testdata/sf0.001"


def test_theil_sen_median_slope(spark):
    got = {r["event_type"]: r for r in theil_sen_trend(spark, SF).collect()}
    rows = duckdb.sql(
        f"""SELECT event_type, date_trunc('hour', ts), count(*)
            FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    h0 = min(r[1] for r in rows)
    h1 = max(r[1] for r in rows)
    spine = []
    h = h0
    while h <= h1:
        spine.append(h)
        h += datetime.timedelta(hours=1)
    for etype in got:
        by = {r[1]: r[2] for r in rows if r[0] == etype}
        xs = [by.get(h, 0) for h in spine]
        slopes = []
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                dy, dt = xs[j] - xs[i], j - i
                slopes.append((Fraction(dy, dt), dy, dt, i))
        slopes.sort()
        n = len(slopes)
        _, dy, dt, _ = slopes[(n + 1) // 2 - 1]
        r = got[etype]
        assert r["n_pairs"] == n
        assert (r["med_dy"], r["med_dt"]) == (dy, dt)
        sign = (dy > 0) - (dy < 0)
        assert r["slope_e6"] == sign * ((1_000_000 * abs(dy)) // dt)


@pytest.fixture(scope="module")
def chains():
    con = duckdb.connect()
    return con.sql(
        f"""SELECT user_id, event_type
            FROM read_parquet('{SF}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    ).fetchall()


def test_frequent_paths_counts_and_identity(spark, chains):
    rows = frequent_paths(spark, SF).collect()
    seqs: dict[int, list[str]] = {}
    for uid, et in chains:
        seqs.setdefault(uid, []).append(et)
    tri: dict[tuple, int] = {}
    pairs: dict[tuple, int] = {}
    mids: dict[str, int] = {}
    for s in seqs.values():
        for i in range(len(s) - 1):
            pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + 1
        for i in range(len(s) - 2):
            k = (s[i], s[i + 1], s[i + 2])
            tri[k] = tri.get(k, 0) + 1
            mids[s[i + 1]] = mids.get(s[i + 1], 0) + 1
    assert len(rows) == len(tri)
    for r in rows:
        k = (r["a"], r["b"], r["c"])
        assert r["n_abc"] == tri[k]
        assert r["n_ab"] == pairs[(r["a"], r["b"])]
        assert r["n_bc"] == pairs[(r["b"], r["c"])]
        assert r["n_b"] == mids[r["b"]]
        assert r["lift_e6"] == (1_000_000 * tri[k] * mids[r["b"]]) // (
            pairs[(r["a"], r["b"])] * pairs[(r["b"], r["c"])]
        )
    # conservation: per middle state, trigram mass re-adds to n_b
    by_b: dict[str, int] = {}
    for r in rows:
        by_b[r["b"]] = by_b.get(r["b"], 0) + r["n_abc"]
    assert by_b == mids
