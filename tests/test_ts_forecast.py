"""EWMA forecast + CUSUM changepoint (plans/timeseries.py) — direct
Python recomputation over the raw events table (independent of both
the Spark plan and the DuckDB oracle SQL)."""

from __future__ import annotations

import datetime

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
    EWMA_HOURS,
    cusum_changepoints,
    ewma_forecast,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hourly():
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT event_type, date_trunc('hour', ts) AS h,
                   count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
            FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    h0 = min(r[1] for r in rows)
    h1 = max(r[1] for r in rows)
    spine = []
    h = h0
    while h <= h1:
        spine.append(h)
        h += datetime.timedelta(hours=1)
    types = sorted({r[0] for r in rows})
    by = {(r[0], r[1]): (r[2], r[3]) for r in rows}
    return types, spine, by


def test_ewma_forecast_closed_form(spark, hourly):
    types, spine, by = hourly
    got = {r["event_type"]: r for r in ewma_forecast(spark, SF).collect()}
    assert set(got) == set(types)
    tail = spine[-EWMA_HOURS:]
    for t in types:
        # closed form: s_T with alpha=1/2, s_0=0, zero-padded gaps
        num = 0
        for j, h in enumerate(reversed(tail)):
            cents = by.get((t, h), (0, 0))[1]
            num += cents << (EWMA_HOURS - 1 - j)
        r = got[t]
        assert r["hours_used"] == len(tail)
        assert r["ewma_num"] == num
        assert r["forecast_cents"] == num >> EWMA_HOURS
        # the recurrence agrees with the closed form (float check)
        s = 0.0
        for h in spine[-EWMA_HOURS:]:
            s = 0.5 * by.get((t, h), (0, 0))[1] + 0.5 * s
        assert abs(s - num / (1 << EWMA_HOURS)) < 1e-6


def test_cusum_finds_argmax_deviation(spark, hourly):
    types, spine, by = hourly
    got = {r["event_type"]: r for r in cusum_changepoints(spark, SF).collect()}
    n_hours = len(spine)
    for t in types:
        xs = [by.get((t, h), (0, 0))[0] for h in spine]
        total = sum(xs)
        best, at, cum_at, t_at = -1, None, None, None
        cum = 0
        for i, h in enumerate(spine[:-1], start=1):
            cum += xs[i - 1]
            dev = abs(n_hours * cum - i * total)
            if dev > best:
                best, at, cum_at, t_at = dev, h, cum, i
        r = got[t]
        assert r["n_hours"] == n_hours
        assert r["total"] == total
        assert r["cusum_num"] == best
        assert r["change_hour"] == at.strftime("%Y-%m-%d %H:%M:%S")
        assert r["mean_before_e6"] == (1_000_000 * cum_at) // t_at
        assert r["mean_after_e6"] == (1_000_000 * (total - cum_at)) // (
            n_hours - t_at
        )
