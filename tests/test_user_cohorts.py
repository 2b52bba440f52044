"""user_cohorts_onepass (plans/surveillance.py): the one-shuffle
conditional-aggregation rewrite equals the set-op anchor, and its plan
really is one fact shuffle."""

from __future__ import annotations

import re

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.surveillance import (
    user_cohorts_onepass,
    user_cohorts_setops,
)

SF = "/root/testdata/sf0.001"


def test_onepass_equals_setops_anchor(spark):
    one = sorted(
        tuple(r) for r in user_cohorts_onepass(spark, SF).collect()
    )
    anchor = sorted(
        tuple(r) for r in user_cohorts_setops(spark, SF).collect()
    )
    assert one == anchor
    assert one  # non-vacuous
    # labels drawn from the three cohort tags (at sf0.001 every clicker
    # also purchased, so click_only is legitimately empty there)
    labels = {c for c, _ in one}
    assert labels <= {
        "click_and_purchase",
        "click_only",
        "signup_or_error",
    }
    assert {"click_and_purchase", "signup_or_error"} <= labels


def test_onepass_plan_has_one_fact_shuffle(spark):
    """The point of the rewrite: ONE user-keyed exchange (plus AQE
    bookkeeping), versus the anchor's ~6 distinct/set-op shuffles."""
    plan = (
        user_cohorts_onepass(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_ex = len(re.findall(r"\bExchange hashpartitioning", plan))
    assert n_ex == 1, plan[:2000]
    anchor_plan = (
        user_cohorts_setops(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_anchor = len(re.findall(r"\bExchange hashpartitioning", anchor_plan))
    assert n_anchor > n_ex  # the anchor genuinely pays more shuffles
