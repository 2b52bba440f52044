"""Recursive-CTE BOM rollup (plans/relational.py::bom_subtree_rollup):
direct recomputation of the derived forest and proof the plan really
runs Spark's recursion operator (not a rewritten join)."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.relational import (
    bom_subtree_rollup,
)

SF = "/root/testdata/sf0.001"


def _forest():
    rows = duckdb.sql(
        f"SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) "
        f"FROM read_parquet('{SF}/part.parquet')"
    ).fetchall()
    cents = dict(rows)
    root_of: dict[int, tuple[int, int]] = {}  # key -> (root, depth)
    for k in sorted(cents):
        if k < 10:
            root_of[k] = (k, 0)
        else:
            r, d = root_of[k // 10]
            root_of[k] = (r, d + 1)
    agg: dict[int, list[int]] = {}
    for k, (r, d) in root_of.items():
        a = agg.setdefault(r, [0, 0, 0])
        a[0] += 1
        a[1] += cents[k]
        a[2] = max(a[2], d)
    return agg


def test_rollup_matches_direct_forest_walk(spark):
    got = {r["root"]: r for r in bom_subtree_rollup(spark, SF).collect()}
    want = _forest()
    assert set(got) == set(want) == set(range(10))
    for root, (n, cents, depth) in want.items():
        r = got[root]
        assert (r["n_parts"], r["total_cents"], r["max_depth"]) == (
            n,
            cents,
            depth,
        )
    # the derived forest must be non-trivial: multi-level and with the
    # singleton root 0 (no key in 10..19 divides to 0)
    assert want[0] == [1, want[0][1], 0]
    assert max(d for _, _, d in want.values()) >= 2


def test_plan_uses_native_recursion(spark):
    plan = (
        bom_subtree_rollup(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Loop" in plan or "Recursion" in plan or "CTERelation" in plan, (
        "recursive CTE compiled away — expected Spark's recursion "
        f"operator in the physical plan:\n{plan[:2000]}"
    )
