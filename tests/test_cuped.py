"""cuped_adjustment: independent Python reference from raw events
(per-user pre/post sums, pooled theta, per-arm adjusted means and
variance-reduction ratio), plus the CUPED guarantees: adjustment
preserves the pooled mean and never increases variance when theta is
the pooled OLS coefficient.
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.ml_eval import (
    CUPED_CUT_DAY,
    cuped_adjustment,
)

SF = "/root/testdata/sf0.001"


def test_cuped_matches_python_reference(spark, sf_dir):
    con = duckdb.connect()
    base = con.sql(
        "SELECT user_id, day(ts), CAST(round(value * 100) AS BIGINT)"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    xs: dict[int, int] = defaultdict(int)
    ys: dict[int, int] = defaultdict(int)
    users = set()
    for u, d, c in base:
        users.add(u)
        if d <= CUPED_CUT_DAY:
            xs[u] += c
        else:
            ys[u] += c
    pn = len(users)
    px = [xs[u] for u in users]
    py = [ys[u] for u in users]
    mx, my = sum(px) / pn, sum(py) / pn
    cov = sum(a * b for a, b in zip(px, py)) / pn - mx * my
    varx = sum(a * a for a in px) / pn - mx * mx
    theta = cov / varx

    rows = {r["arm"]: r for r in cuped_adjustment(spark, SF).collect()}
    assert set(rows) == {0, 1}
    for arm in (0, 1):
        au = [u for u in users if u % 2 == arm]
        ax = [xs[u] for u in au]
        ay = [ys[u] for u in au]
        n = len(au)
        amx, amy = sum(ax) / n, sum(ay) / n
        a_cov = sum(a * b for a, b in zip(ax, ay)) / n - amx * amy
        a_varx = sum(a * a for a in ax) / n - amx * amx
        a_vary = sum(a * a for a in ay) / n - amy * amy
        var_adj = a_vary - 2 * theta * a_cov + theta * theta * a_varx
        r = rows[arm]
        assert r["n_users"] == n
        assert r["theta_e6"] == round(theta * 1e6)
        assert math.isclose(r["mean_y"], amy, abs_tol=2e-6)
        assert math.isclose(
            r["mean_y_adj"], amy - theta * (amx - mx), abs_tol=2e-6
        )
        assert math.isclose(
            r["var_reduction"], var_adj / a_vary, abs_tol=2e-6
        )

    # CUPED guarantees on the POOLED population: the adjustment is
    # mean-preserving, and with the pooled OLS theta the pooled
    # adjusted variance is var(Y)·(1 − ρ²) ≤ var(Y)
    vary = sum(b * b for b in py) / pn - my * my
    pooled_adj = vary - 2 * theta * cov + theta * theta * varx
    rho2 = cov * cov / (varx * vary)
    assert math.isclose(pooled_adj, vary * (1 - rho2), rel_tol=1e-9)
    assert pooled_adj <= vary
