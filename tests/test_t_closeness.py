"""t_closeness_audit: hand-computed TVD on crafted classes (one class
matching the global distribution exactly — TVD driven only by the
other's skew — and one concentrated class), plus a full second
implementation over the real testdata (dense per-class walk including
absent bands, vs the plan's sparse present/absent split).
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pipeline_quality import (
    T_CLOSE_E6,
    t_closeness_audit,
)

SF = "/root/testdata/sf0.001"


def _ev(eid, hour, user, typ, value):
    return (eid, dt.datetime(2024, 1, 5, hour, 0, 0), user, typ, value, "{}")


# Class A: 30 rows in band 0, 10 in band 1. Class B: 10 rows band 0,
# 30 band 1. Global: 40/40. Per class TVD = ½(|3/4−1/2| + |1/4−1/2|)
# = 1/4 for both.
ROWS = (
    [_ev(i, 1, i, "a", 50.0) for i in range(30)]
    + [_ev(100 + i, 1, i, "a", 150.0) for i in range(10)]
    + [_ev(200 + i, 7, i, "b", 50.0) for i in range(10)]
    + [_ev(300 + i, 7, i, "b", 150.0) for i in range(30)]
)


@pytest.fixture(scope="module")
def crafted_sf(spark, tmp_path_factory):
    sf = tmp_path_factory.mktemp("tclose_sf")
    spark.createDataFrame(
        ROWS,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(sf / "events.parquet"))
    return str(sf)


def test_t_closeness_hand_computed(spark, crafted_sf):
    rows = {
        (r["event_type"], r["hour_band"]): r
        for r in t_closeness_audit(spark, crafted_sf).collect()
    }
    assert set(rows) == {("a", 0), ("b", 1)}
    for key in rows:
        r = rows[key]
        assert r["n_rows"] == 40
        assert r["tvd_e6"] == 250_000  # exactly 1/4
        assert bool(r["at_risk"]) == (250_000 > T_CLOSE_E6)


def test_t_closeness_matches_dense_walk(spark, sf_dir):
    """Second implementation: dense per-class TVD over ALL global bands
    (fractions in exact integers, floor at the same e6 scale)."""
    con = duckdb.connect()
    base = con.sql(
        "SELECT event_type, CAST(floor(hour(ts) / 6) AS INT),"
        " CAST(floor(CAST(round(value * 100) AS BIGINT) / 10000.0) AS INT)"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    gdist: Counter = Counter(b for _, _, b in base)
    n_all = len(base)
    per_class: dict[tuple, Counter] = {}
    for t, hb, b in base:
        per_class.setdefault((t, hb), Counter())[b] += 1
    rows = {
        (r["event_type"], r["hour_band"]): r
        for r in t_closeness_audit(spark, SF).collect()
    }
    assert set(rows) == set(per_class)
    for key, cdist in per_class.items():
        n_c = sum(cdist.values())
        num = sum(
            abs(cdist.get(b, 0) * n_all - gdist[b] * n_c) for b in gdist
        )
        expect = (1_000_000 * num) // (2 * n_c * n_all)
        r = rows[key]
        assert r["n_rows"] == n_c
        assert r["tvd_e6"] == expect
        # scaled integer tracks the float TVD within one e6 ulp
        tvd = 0.5 * sum(
            abs(cdist.get(b, 0) / n_c - gdist[b] / n_all) for b in gdist
        )
        assert math.isclose(r["tvd_e6"] / 1e6, tvd, abs_tol=1e-6)
