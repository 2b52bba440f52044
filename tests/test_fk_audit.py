"""fk_integrity_audit: hand-computed orphan/unreferenced accounting on
a crafted mini-warehouse (orphan FKs, a NULL FK, unreferenced
parents). Oracle parity at sf0.01 is the driver/check_oracle gate;
this pins the histogram/full-join classification itself.
"""

from __future__ import annotations

import datetime as dt

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pipeline_quality import (
    fk_integrity_audit,
)

_TS = dt.datetime(2024, 1, 1, 12, 0, 0)

TABLES = {
    "region": ([(0,)], "r_regionkey long"),
    # nation 1 points at a missing region
    "nation": ([(0, 0), (1, 99)], "n_nationkey long, n_regionkey long"),
    # customer 11 has a NULL nationkey
    "customer": (
        [(10, 0), (11, None), (12, 1)],
        "c_custkey long, c_nationkey long",
    ),
    "supplier": ([(5, 0)], "s_suppkey long, s_nationkey long"),
    "part": ([(7,)], "p_partkey long"),
    # order 101 references a missing customer
    "orders": (
        [(100, 10), (101, 999), (102, 10)],
        "o_orderkey long, o_custkey long",
    ),
    # second lineitem: missing order AND missing supplier
    "lineitem": (
        [(100, 7, 5), (999, 7, 8)],
        "l_orderkey long, l_partkey long, l_suppkey long",
    ),
    # event user 888 is no customer; one NULL user
    "events": (
        [(1, _TS, 10), (2, _TS, 888), (3, _TS, None)],
        "event_id long, ts timestamp, user_id long",
    ),
}

# relation -> (n_child_rows, n_null_fk_rows, n_orphan_rows,
#              n_orphan_keys, n_parent_keys, n_unreferenced_parents)
EXPECT = {
    "orders.custkey->customer": (3, 0, 1, 1, 3, 2),
    "lineitem.orderkey->orders": (2, 0, 1, 1, 3, 2),
    "lineitem.partkey->part": (2, 0, 0, 0, 1, 0),
    "lineitem.suppkey->supplier": (2, 0, 1, 1, 1, 0),
    "customer.nationkey->nation": (3, 1, 0, 0, 2, 0),
    "supplier.nationkey->nation": (1, 0, 0, 0, 2, 1),
    "nation.regionkey->region": (2, 0, 1, 1, 1, 0),
    "events.user_id->customer": (3, 1, 1, 1, 3, 2),
}


@pytest.fixture(scope="module")
def crafted_sf(spark, tmp_path_factory):
    sf = tmp_path_factory.mktemp("fkaudit_sf")
    for name, (rows, schema) in TABLES.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(sf / f"{name}.parquet"))
    return str(sf)


def test_fk_audit_hand_computed(spark, crafted_sf):
    got = {
        r["relation"]: (
            r["n_child_rows"],
            r["n_null_fk_rows"],
            r["n_orphan_rows"],
            r["n_orphan_keys"],
            r["n_parent_keys"],
            r["n_unreferenced_parents"],
        )
        for r in fk_integrity_audit(spark, crafted_sf).collect()
    }
    assert got == EXPECT


def test_fk_audit_tpch_edges_clean_on_testdata(spark, sf_dir):
    rows = {r["relation"]: r for r in fk_integrity_audit(spark, sf_dir).collect()}
    assert set(rows) == set(EXPECT)
    # the warehouse's own FK edges are generated consistent
    for rel, r in rows.items():
        if rel != "events.user_id->customer":
            assert r["n_orphan_rows"] == 0, rel
            assert r["n_null_fk_rows"] == 0, rel
