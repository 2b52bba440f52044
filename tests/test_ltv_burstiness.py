"""Cohort LTV triangle and inter-arrival burstiness — direct Python
recomputation plus each query's conservation identity."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.relational import (
    cohort_ltv_triangle,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
    interarrival_burstiness,
    interarrival_burstiness_sharded,
)

SF = "/root/testdata/sf0.001"


def test_ltv_triangle_matches_direct(spark):
    rows = cohort_ltv_triangle(spark, SF).collect()
    base = duckdb.sql(
        f"""SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(round(value * 100) AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    first = {}
    for u, d, _ in base:
        if u not in first or d < first[u]:
            first[u] = d
    sizes: dict = {}
    for u, d in first.items():
        sizes[d] = sizes.get(d, 0) + 1
    cells: dict = {}
    actives: dict = {}
    for u, d, c in base:
        k = (first[u], (d - first[u]).days // 7)
        cells[k] = cells.get(k, 0) + c
        actives.setdefault(k, set()).add(u)
    assert len(rows) == len(cells)
    got = {(r["cohort_day"], r["age_week"]): r for r in rows}
    for (cd, aw), cents in cells.items():
        r = got[(cd.strftime("%Y-%m-%d"), aw)]
        assert r["revenue_cents"] == cents
        assert r["active_users"] == len(actives[(cd, aw)])
        assert r["cohort_size"] == sizes[cd]
        cum = sum(v for (c2, a2), v in cells.items() if c2 == cd and a2 <= aw)
        assert r["cum_cents"] == cum
        assert r["ltv_per_user_e6"] == (1_000_000 * cum) // sizes[cd]
    # conservation: triangle cells re-add to the table total
    assert sum(r["revenue_cents"] for r in rows) == sum(c for _, _, c in base)


def test_burstiness_matches_direct(spark):
    got = {
        r["event_type"]: r for r in interarrival_burstiness(spark, SF).collect()
    }
    base = duckdb.sql(
        f"""SELECT event_type, epoch_us(ts) // 1000000 AS t
            FROM read_parquet('{SF}/events.parquet')
            ORDER BY event_type, ts, event_id"""
    ).fetchall()
    by: dict = {}
    for et, t in base:
        by.setdefault(et, []).append(int(t))
    for et, ts in by.items():
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        n, s, q = len(gaps), sum(gaps), sum(g * g for g in gaps)
        r = got[et]
        assert (r["n_gaps"], r["span_s"], r["sum_sq"], r["max_gap_s"]) == (
            n,
            s,
            q,
            max(gaps),
        )
        # telescoping: the gap sum IS last - first
        assert s == ts[-1] - ts[0]
        assert r["mean_gap_ms"] == (1000 * s) // n
        assert r["cv2_e6"] == (1_000_000 * (n * q - s * s)) // (s * s)
        # near-Poisson synthetic traffic: CV^2 should sit near 1
        assert 100_000 < r["cv2_e6"] < 10_000_000


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sharded_twin_equals_anchor(spark):
    """The 100 TB (type, day)-sharded-lag form is value-identical to
    the per-type ordered-lag anchor on the driver testdata."""
    assert _rows(interarrival_burstiness_sharded(spark, SF)) == _rows(
        interarrival_burstiness(spark, SF)
    )


def test_sharded_twin_has_no_per_type_global_sort(spark):
    """The point of the twin: the wide lag window must be partitioned
    by (event_type, shard_day), never by event_type alone — one sort
    task per type over that type's entire history is the anchor's
    scale ceiling."""
    plan = (
        interarrival_burstiness_sharded(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    lag_lines = [ln for ln in plan.splitlines() if "lag(" in ln]
    assert lag_lines, "expected a lag window in the plan"
    for ln in lag_lines:
        if "t_s" in ln:  # the wide per-row window
            assert "shard_day" in ln
    # contrast: the anchor's lag IS partitioned by event_type alone
    anchor = (
        interarrival_burstiness(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    anchor_lag = [ln for ln in anchor.splitlines() if "lag(" in ln]
    assert anchor_lag and all("shard_day" not in ln for ln in anchor_lag)


def test_sharded_twin_boundary_stitch_edges(spark, tmp_path):
    """Hand-built corpus pinning the stitch seams: a day boundary, two
    events in the SAME second straddling midnight order, an EMPTY day
    between populated shards, and a single-event type (no gaps → no
    output row, matching the anchor)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    def us(*a):
        return int(datetime(*a).timestamp() * 1_000_000)

    rows = [
        # type a: interior gap, midnight boundary, same-second tie,
        # then a jump over an entirely empty day
        (1, us(2024, 1, 1, 23, 59, 58), 10, "a", 1.0, "{}"),
        (2, us(2024, 1, 1, 23, 59, 59), 10, "a", 1.0, "{}"),
        (3, us(2024, 1, 2, 0, 0, 1), 10, "a", 1.0, "{}"),
        (4, us(2024, 1, 2, 0, 0, 1), 10, "a", 1.0, "{}"),
        (5, us(2024, 1, 4, 6, 0, 0), 10, "a", 1.0, "{}"),
        # type b: single event — zero gaps, must produce NO row
        (6, us(2024, 1, 1, 12, 0, 0), 11, "b", 1.0, "{}"),
        # type c: all inside one shard (stitch contributes nothing)
        (7, us(2024, 1, 3, 1, 0, 0), 12, "c", 1.0, "{}"),
        (8, us(2024, 1, 3, 1, 0, 5), 12, "c", 1.0, "{}"),
        (9, us(2024, 1, 3, 1, 0, 7), 12, "c", 1.0, "{}"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    sharded = {
        r["event_type"]: r
        for r in interarrival_burstiness_sharded(spark, str(tmp_path)).collect()
    }
    anchor = {
        r["event_type"]: r
        for r in interarrival_burstiness(spark, str(tmp_path)).collect()
    }
    assert set(sharded) == set(anchor) == {"a", "c"}  # b: no gaps
    for et in ("a", "c"):
        assert tuple(sharded[et]) == tuple(anchor[et])
    # hand-checked gap multiset for a: [1, 2, 0, 2·86400 - 3600·18 + ...]
    a = sharded["a"]
    gaps = [1, 2, 0, us(2024, 1, 4, 6, 0, 0) // 10**6 - us(2024, 1, 2, 0, 0, 1) // 10**6]
    assert a["n_gaps"] == 4
    assert a["span_s"] == sum(gaps)
    assert a["sum_sq"] == sum(g * g for g in gaps)
    assert a["max_gap_s"] == max(gaps)
