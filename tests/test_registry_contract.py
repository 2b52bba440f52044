"""Registry-wide mechanical contract checks (VERDICT r5 #1/#7).

Two failure classes shipped red in judge rounds instead of CI:

1. ``inverted_index`` (r5): an ArrayType output column — the driver's
   canonicalizer sorts/hashes result cells with pandas, which cannot
   hash list cells, so the query errors in the harness no matter how
   correct it is. Contract: no registry query may output an
   array/map/struct-typed column; serialize to a scalar (the
   ``array_join`` pattern) instead.

2. The r4 weak trio (``bigram_lift`` etc.): an un-partitioned Window
   over an unbounded frame — the single-task funnel that kills 100 TB
   scale. ``tools/explain_audit.py`` detects it; previously only five
   named sites were pinned. Here the detector walks EVERY registered
   query's physical plan so the next offender ships red in CI.

Both checks need each query's analyzed/executed plan, which means
calling ``fn(spark, sf)`` for all ~145 registry entries — done once in
a session fixture at sf0.001 (plan construction only; queries with
internal driver-side partials run tiny jobs)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans import (  # noqa: E402
    QUERIES,
)
from tools.explain_audit import (  # noqa: E402
    ALLOWED_GLOBAL_WINDOWS,
    _global_window_unbounded,
)


# registry_dfs now lives in conftest.py (session-scoped): the bench
# guard's analysis check and these plan audits share ONE full-registry
# construction pass. The AQE-off / tiny-maxPartitionBytes rationale is
# documented on the fixture.


@pytest.fixture(scope="module")
def registry_plans(registry_dfs):
    dfs, errors = registry_dfs
    assert not errors, errors
    return dfs


def test_no_nested_output_columns(registry_plans):
    """Driver-harness contract: every output cell must be pandas-
    sortable/hashable — scalars only, no array/map/struct columns."""
    bad = []
    for name, (df, _plan) in registry_plans.items():
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, (
        "registry queries with nested output columns (driver canonicalizer "
        f"cannot hash these — serialize with array_join/to_json): {bad}"
    )


def test_no_unbounded_global_window(registry_plans):
    """Every registered query's physical plan is free of un-partitioned
    Windows over unbounded frames, except the documented exact-oracle
    anchors in ALLOWED_GLOBAL_WINDOWS (each justified in its docstring
    with its distributed 100 TB alternative)."""
    offenders = [
        name
        for name, (_df, plan) in registry_plans.items()
        if name not in ALLOWED_GLOBAL_WINDOWS
        and _global_window_unbounded(plan)
    ]
    assert not offenders, (
        "unbounded global window (single-task funnel at scale) in: "
        f"{offenders} — use the orderBy().limit(k)-then-rank pattern, or "
        "add to ALLOWED_GLOBAL_WINDOWS with a docstring rationale"
    )


def test_allowed_global_windows_still_needed(registry_plans):
    """Detector-sensitivity guard in reverse: every ALLOWED entry must
    still trip the detector — a stale allowance would mask a future
    regression elsewhere in that query."""
    stale = [
        name
        for name in ALLOWED_GLOBAL_WINDOWS
        if name in registry_plans
        and not _global_window_unbounded(registry_plans[name][1])
    ]
    assert not stale, f"ALLOWED_GLOBAL_WINDOWS entries no longer needed: {stale}"


def test_no_cartesian_or_rowwise_python(registry_plans):
    """The other two explain_audit flags, mechanically over the whole
    registry: no CartesianProduct (unbounded cross join — broadcast
    NLJ with a tiny build side prints as BroadcastNestedLoopJoin and
    is fine), and no BatchEvalPython (row-at-a-time Python UDF outside
    Arrow) anywhere in any physical plan."""
    cartesian, rowpy = [], []
    for name, (_df, plan) in registry_plans.items():
        tree = plan.toString()
        if "CartesianProduct" in tree:
            cartesian.append(name)
        if "BatchEvalPython" in tree:
            rowpy.append(name)
    assert not cartesian, f"CartesianProduct in: {cartesian}"
    assert not rowpy, f"row-at-a-time Python UDF in: {rowpy}"



# Deliberately oracle-less queries (the driver records rows-only; a
# dedicated test is the correctness gate). Adding here is the explicit
# decision this contract demands — never a silent downgrade.
ORACLE_EXEMPT = {
    # DataSketches HLL estimates have no ANSI-SQL equivalent;
    # test_two_hop_approx bounds every row against the exact anchor
    "spatial_two_hop_reach_approx",
    # same: HLL sketch state per round; test_hyperanf bounds every
    # N(r) against exact python BFS
    "neardup_neighborhood_function",
}


def test_every_query_has_an_oracle():
    """r6 closed the last two no-oracle queries (stratified_sample via
    the portable hash sampler, approx_aggregates via exact+bounds
    columns); from here, shipping a registry query without a DuckDB
    oracle is a deliberate decision that must edit this test (see
    ORACLE_EXEMPT), not a silent rows-only downgrade."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans import (
        ORACLES,
    )

    missing = [n for n in QUERIES if n not in ORACLES and n not in ORACLE_EXEMPT]
    assert not missing, f"registry queries without oracles: {missing}"
