"""Spatial plans (plans/spatial.py): grid join vs brute force, bounded
NN semantics, density-cell exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.spatial import (
    _MOD,
    _MULT,
    NN_RADIUS,
    PAIR_RADIUS,
    WORLD,
    COLOC_BAND_US,
    COLOC_CELL,
    TRI_RADIUS,
    colocation_encounters,
    crowd_density_hotspots,
    spatial_nearest_site,
    spatial_neighbor_pairs,
    spatial_triangle_census,
    spatial_two_hop_reach,
)


def _xy(key: int) -> tuple[int, int]:
    h = (key * _MULT) % _MOD
    return h % WORLD, (h // WORLD) % WORLD


def _brute_pairs(keys: list[int], radius: int) -> set[tuple[int, int, int]]:
    pts = {k: _xy(k) for k in keys}
    out = set()
    for a in keys:
        for b in keys:
            if a >= b:
                continue
            d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            if d2 <= radius * radius:
                out.add((a, b, d2))
    return out


def _custkeys(spark, sf_dir) -> list[int]:
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return [r.c_custkey for r in df.select("c_custkey").collect()]


def test_pairs_match_brute_force(spark, sf_dir):
    """The 3x3 grid expansion finds every within-radius pair exactly
    once — completeness AND no-dup, against an O(n^2) reference."""
    keys = _custkeys(spark, sf_dir)
    want = _brute_pairs(keys, PAIR_RADIUS)
    got = {
        (r.site_a, r.site_b, r.dist2)
        for r in spatial_neighbor_pairs(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) == len(spatial_neighbor_pairs(spark, sf_dir).collect())


def test_nearest_site_is_argmin_with_deterministic_ties(spark, sf_dir):
    keys = _custkeys(spark, sf_dir)
    pts = {k: _xy(k) for k in keys}
    want = {}
    for a in keys:
        best = None
        for b in keys:
            if a == b:
                continue
            d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            if d2 <= NN_RADIUS * NN_RADIUS and (
                best is None or (d2, b) < best
            ):
                best = (d2, b)
        if best is not None:
            want[a] = (best[1], best[0])
    got = {
        r.site: (r.nn_site, r.nn_dist2)
        for r in spatial_nearest_site(spark, sf_dir).collect()
    }
    assert got == want


def test_hotspot_cells_partition_the_events(spark, sf_dir):
    """Cell stats re-aggregate to the table totals (nothing dropped or
    double-counted) and cents sums are exact int64."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cells = crowd_density_hotspots(spark, sf_dir)
    tot = cells.agg(
        F.sum("n_events").alias("e"),
        F.sum("value_cents").alias("c"),
        F.sum("n_errors").alias("r"),
    ).first()
    want = ev.agg(
        F.count("*").alias("e"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        F.count_if(F.col("event_type") == "error").alias("r"),
    ).first()
    assert (tot.e, tot.c, tot.r) == (want.e, want.c, want.r)
    # each user maps to exactly one cell, so distinct users across
    # cells must equal distinct users in the table
    n_users = cells.agg(F.sum("n_users")).first()[0]
    assert n_users == ev.select("user_id").distinct().count()


def test_triangle_census_matches_brute_force(spark):
    """Degree-ordered compact-forward vs an O(n*d^2) adjacency-set
    count. sf0.01, not the smoke fixture: the sf0.001 site set has
    ZERO within-radius pairs, which would make this test vacuous."""
    sf = "/root/testdata/sf0.01"
    keys = _custkeys(spark, sf)
    adj = {k: set() for k in keys}
    for a, b, _ in _brute_pairs(keys, TRI_RADIUS):
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for v in keys:
        nbrs = adj[v]
        d = len(nbrs)
        t = sum(
            1
            for u in nbrs
            for w in nbrs
            if u < w and w in adj[u]
        )
        wedges = d * (d - 1) // 2
        lcc = t * 1_000_000 // wedges if d >= 2 else None
        want[v] = (d, t, wedges, lcc)
    got = {
        r.site: (r.degree, r.triangles, r.wedges, r.lcc_micro)
        for r in spatial_triangle_census(spark, sf).collect()
    }
    assert got == want
    assert any(v[1] > 0 for v in want.values()), "no triangles = vacuous"


def test_two_hop_reach_matches_brute_force(spark):
    """Fixed-depth BFS vs python set expansion over the same
    adjacency (sf0.01 — the smoke site set has no edges). The reach
    graph uses PAIR_RADIUS: at TRI_RADIUS the hash blobs are pure
    cliques and the 2nd hop adds nothing (measured), which would make
    the operator vacuous."""
    sf = "/root/testdata/sf0.01"
    keys = _custkeys(spark, sf)
    adj = {k: set() for k in keys}
    for a, b, _ in _brute_pairs(keys, PAIR_RADIUS):
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for v in keys:
        two = set(adj[v])
        for m in adj[v]:
            two |= adj[m]
        two.discard(v)
        want[v] = (len(adj[v]), len(two))
    got = {
        r.site: (r.n_1hop, r.n_2hop)
        for r in spatial_two_hop_reach(spark, sf).collect()
    }
    assert got == want
    assert any(v[1] > v[0] for v in want.values()), "2-hop adds nothing?"


def test_colocation_matches_brute_force(spark):
    """Banded spatio-temporal join vs a per-cell O(k^2) reference.
    sf0.01: the smoke tables have zero qualifying pairs."""
    from collections import defaultdict
    from datetime import timezone

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, "events", sf).select("user_id", "ts")
    by_cell = defaultdict(list)
    for r in ev.collect():
        x, y = _xy(r.user_id)
        us = round(
            r.ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        )
        by_cell[(x // COLOC_CELL, y // COLOC_CELL)].append(
            (r.user_id, us)
        )
    want = defaultdict(lambda: [0, None, None])
    for (cx, cy), rows in by_cell.items():
        for ua, ta in rows:
            for ub, tb in rows:
                if ua < ub and abs(ta - tb) <= COLOC_BAND_US:
                    e = want[(ua, ub, cx, cy)]
                    e[0] += 1
                    lo, hi = min(ta, tb), max(ta, tb)
                    e[1] = lo if e[1] is None else min(e[1], lo)
                    e[2] = hi if e[2] is None else max(e[2], hi)
    got = {
        (r.user_a, r.user_b, r.cx, r.cy): r.n_encounters
        for r in colocation_encounters(spark, sf).collect()
    }
    assert got == {k: v[0] for k, v in want.items()}
    assert got, "zero encounters would make this vacuous"


def test_no_python_udf_in_plans(spark, sf_dir):
    for fn in (
        spatial_neighbor_pairs,
        spatial_nearest_site,
        crowd_density_hotspots,
    ):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
