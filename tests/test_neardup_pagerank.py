"""neardup_pagerank: full parity against a plain-Python reference of
the integer-exact damped power iteration, driven by the SAME LSH edge
set the query uses (sf0.001 corpus — small enough to materialize the
graph driver-side). Oracle parity at sf0.01 is the driver/check_oracle
gate; this pins the arithmetic spec (int64 floor divisions, 85/100
damping as an exact ratio, dropped dangling mass) and the mass bounds.
"""

from __future__ import annotations

from collections import defaultdict

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.similarity import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_ROUNDS,
    PR_SCALE,
    embedding_neardup_lsh,
    neardup_pagerank,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def _reference(pairs, nodes):
    out = defaultdict(list)
    for a, b in pairs:
        out[a].append(b)
        out[b].append(a)
    n = len(nodes)
    r0 = PR_SCALE // n
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * r0 // PR_DAMP_DEN
    rank = {v: r0 for v in nodes}
    for _ in range(PR_ROUNDS):
        inc = defaultdict(int)
        for src, dsts in out.items():
            c = rank[src] // len(dsts)
            for d in dsts:
                inc[d] += c
        rank = {v: base + inc[v] * PR_DAMP_NUM // PR_DAMP_DEN for v in nodes}
    return rank, {v: len(out[v]) for v in nodes}


def test_neardup_pagerank_matches_python_reference(spark, sf_dir):
    pairs = [
        (r["ia"], r["ib"])
        for r in embedding_neardup_lsh(spark, sf_dir).collect()
    ]
    nodes = [
        r["vec_id"]
        for r in load_table(spark, "embeddings", sf_dir).collect()
    ]
    want_rank, want_deg = _reference(pairs, nodes)

    got = neardup_pagerank(spark, sf_dir).collect()
    assert len(got) == len(nodes)
    for r in got:
        v = r["vec_id"]
        assert r["pagerank_scaled"] == want_rank[v], v
        assert r["degree"] == want_deg[v], v
    # structure checks: mass never exceeds the scaled total (dangling
    # mass is dropped, so ≤, not ==), every rank is at least the
    # teleport base, and hub ranks actually separate from the base
    n = len(nodes)
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * (PR_SCALE // n) // PR_DAMP_DEN
    total = sum(r["pagerank_scaled"] for r in got)
    assert total <= PR_SCALE
    assert all(r["pagerank_scaled"] >= base for r in got)
    assert any(
        r["pagerank_scaled"] > base for r in got if r["degree"] > 0
    )
