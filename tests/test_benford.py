"""Benford first-digit audit (plans/stats.py) — direct recomputation
plus the constant-table invariants."""

from __future__ import annotations

import math

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.stats import (
    BENFORD_AUDIT_SQL,
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


def test_benford_engines_agree_on_degenerate_totals(spark, tmp_path):
    """Non-positive and sub-cent totals have no significant digit
    ('-'/'0'): BOTH engines must exclude them from the grid AND from
    n_grp, and a missing digit must still contribute |0 − expected| —
    the dense-grid + digit-range seam, pinned off the happy path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # priority A: digits 1 and 9 only, plus garbage that must not
        # count anywhere (negative, zero, sub-cent)
        ("A", 123.45), ("A", 150.00), ("A", 9.99),
        ("A", -50.00), ("A", 0.0), ("A", 0.004),
        # priority B: every order degenerate → no grid rows at all
        ("B", -1.0), ("B", 0.0),
    ]
    table = pa.table(
        {
            "o_orderkey": pa.array(range(len(rows)), pa.int64()),
            "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
        }
    )
    pq.write_table(table, str(tmp_path / "orders.parquet"))
    got = sorted(
        tuple(r) for r in benford_audit(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS "
        f"SELECT * FROM read_parquet('{tmp_path}/orders.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(BENFORD_AUDIT_SQL).fetchall())
    assert got == want
    # priority A: dense 9-digit grid over n_grp=3 (garbage excluded);
    # priority B vanished entirely (no valid digit)
    assert len(got) == 9
    assert {r[0] for r in got} == {"A"}
    by_digit = {r[1]: r for r in got}
    assert by_digit[1][2] == 2 and by_digit[9][2] == 1  # n_obs
    assert by_digit[2][2] == 0  # dense zero row
    # n_grp is 3 everywhere: obs_e6 for digit 1 = floor(2e6/3)
    assert by_digit[1][3] == 666_666
