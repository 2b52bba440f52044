"""k_anonymity_audit: crafted classes exercising each risk arm —
k-risk (too few rows), l-risk (enough rows, too few distinct users),
and a safe class. Oracle parity at sf0.01 is the driver/check_oracle
gate; this pins the two-phase distinct accounting and the flag logic.
"""

from __future__ import annotations

import datetime as dt

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pipeline_quality import (
    K_ANON,
    L_DIV,
    k_anonymity_audit,
)


def _ev(eid, hour, user, typ, value):
    return (eid, dt.datetime(2024, 1, 5, hour, 0, 0), user, typ, value, "{}")


ROWS = (
    # safe: 60 rows, 30 users
    [_ev(i, 1, 1000 + i % 30, "a", 50.0) for i in range(60)]
    # l-risk: 60 rows but only 2 users
    + [_ev(100 + i, 7, 2000 + i % 2, "b", 150.0) for i in range(60)]
    # k-risk: 10 rows from 10 users
    + [_ev(200 + i, 13, 3000 + i, "c", 250.0) for i in range(10)]
)

EXPECT = {
    ("a", 0, 0): (60, 30, False),
    ("b", 1, 1): (60, 2, True),
    ("c", 2, 2): (10, 10, True),
}


@pytest.fixture(scope="module")
def crafted_sf(spark, tmp_path_factory):
    sf = tmp_path_factory.mktemp("kanon_sf")
    spark.createDataFrame(
        ROWS,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "events.parquet"))
    return str(sf)


def test_k_anonymity_hand_computed(spark, crafted_sf):
    assert K_ANON == 50 and L_DIV == 25  # expectations below assume these
    got = {
        (r["event_type"], r["hour_band"], r["value_band"]): (
            r["n_rows"],
            r["n_users"],
            r["at_risk"],
        )
        for r in k_anonymity_audit(spark, crafted_sf).collect()
    }
    assert got == EXPECT


def test_k_anonymity_consistency_on_testdata(spark, sf_dir):
    rows = k_anonymity_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_users"] <= r["n_rows"]
        assert r["at_risk"] == (r["n_rows"] < K_ANON or r["n_users"] < L_DIV)
        assert 0 <= r["hour_band"] <= 3


def test_k_anonymity_generalize_levels(spark, crafted_sf):
    """On the crafted classes: 'a' is safe at level 0; 'b' (2 users)
    and 'c' (10 rows) stay unsafe at every level of the hierarchy
    because coarsening cannot add rows or users to a class that is
    alone on its (type, hour_band) axis -> suppressed."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pipeline_quality import (
        k_anonymity_generalize,
    )

    got = {
        (r["event_type"], r["hour_band"], r["value_band"]): (
            r["n_rows"],
            r["release_level"],
        )
        for r in k_anonymity_generalize(spark, crafted_sf).collect()
    }
    assert got == {
        ("a", 0, 0): (60, 0),
        ("b", 1, 1): (60, -1),
        ("c", 2, 2): (10, -1),
    }


def test_k_anonymity_generalize_monotone_on_testdata(spark, sf_dir):
    """Release levels agree with the audit: a class flagged safe by the
    audit must release at level 0, and every class has a level in
    {-1, 0, 1, 2}."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pipeline_quality import (
        k_anonymity_audit,
        k_anonymity_generalize,
    )

    audit = {
        (r["event_type"], r["hour_band"], r["value_band"]): r["at_risk"]
        for r in k_anonymity_audit(spark, sf_dir).collect()
    }
    rel = k_anonymity_generalize(spark, sf_dir).collect()
    assert len(rel) == len(audit)
    for r in rel:
        key = (r["event_type"], r["hour_band"], r["value_band"])
        assert r["release_level"] in (-1, 0, 1, 2)
        assert (r["release_level"] == 0) == (not audit[key])
