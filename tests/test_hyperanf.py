"""HyperANF neighborhood function vs exact BFS: every N(r) estimate
must sit within HLL error of the exact summed ball sizes over the
same near-dup graph, r=0 exactly. This test is the correctness gate —
the query has no SQL oracle (sketch internals are engine-specific).
"""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.dedup import (
    HYPERANF_RADIUS,
    _neardup_edges,
    neardup_neighborhood_function,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)

REL_TOL = 0.05  # DataSketches HLL_4 lgK=12 RSE ~1.6%; ~3 sigma headroom


def test_estimates_track_exact_bfs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    doc_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    adj = {d: set() for d in doc_ids}
    for r in _neardup_edges(docs).collect():
        adj[r.ia].add(r.ib)
        adj[r.ib].add(r.ia)
    assert any(adj.values()), "near-dup graph has no edges = vacuous"
    balls = {d: {d} for d in doc_ids}
    exact = {0: len(doc_ids)}
    for rad in range(1, HYPERANF_RADIUS + 1):
        balls = {
            d: b | set().union(*(balls[u] for u in adj[d]), b)
            if adj[d]
            else b
            for d, b in balls.items()
        }
        exact[rad] = sum(len(b) for b in balls.values())
    got = {
        r["radius"]: (r["n_docs"], r["ball_sum"])
        for r in neardup_neighborhood_function(spark, sf_dir).collect()
    }
    assert set(got) == set(exact)
    assert exact[HYPERANF_RADIUS] > exact[0], "graph growth = non-vacuous"
    for rad, want_sum in exact.items():
        n_docs, ball_sum = got[rad]
        assert n_docs == len(doc_ids)
        if rad == 0:
            assert ball_sum == want_sum  # exact by construction
        else:
            assert abs(ball_sum - want_sum) <= max(1, REL_TOL * want_sum), (
                rad,
                ball_sum,
                want_sum,
            )
