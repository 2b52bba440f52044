"""PageRank operator: parity with a dense numpy power iteration
(dangling redistribution included) and probability-mass conservation.
"""

from __future__ import annotations

import numpy as np
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.pagerank import (
    pagerank,
)

DAMPING, ITERS = 0.85, 10

# a graph with a hub (0), a cycle (1→2→3→1), and a dangling node (4)
EDGES = [(1, 0), (2, 0), (3, 0), (1, 2), (2, 3), (3, 1), (0, 4)]


def _numpy_pagerank(edges, iters, d):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = r[out == 0].sum()
        nxt += d * dangling / n
        for s, t in edges:
            nxt[idx[t]] += d * r[idx[s]] / out[idx[s]]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def ranks(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    return {
        r.node: r.rank
        for r in pagerank(df, iters=ITERS, damping=DAMPING).collect()
    }


def test_matches_numpy_power_iteration(ranks):
    want = _numpy_pagerank(EDGES, ITERS, DAMPING)
    assert set(ranks) == set(want)
    for v in want:
        assert abs(ranks[v] - want[v]) < 1e-9, (v, ranks[v], want[v])


def test_mass_conserved_and_sink_chain_ranks_highest(ranks):
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # 4 drains the hub (0's only out-edge), which drains the cycle —
    # so rank orders 4 > 0 > cycle members
    assert ranks[4] > ranks[0] > max(ranks[v] for v in (1, 2, 3))


def test_neardup_graph_ranks(spark, sf_dir):
    """On the real near-dup graph: symmetrized edges, mass conserved,
    every clustered doc ranked."""
    from pyspark.sql import functions as F

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.dedup import (
        _neardup_edges,
    )
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "documents", sf_dir)
    pairs = _neardup_edges(docs)
    sym = pairs.select(
        F.col("ia").alias("src"), F.col("ib").alias("dst")
    ).union(pairs.select(F.col("ib").alias("src"), F.col("ia").alias("dst")))
    n_nodes = sym.select("src").distinct().count()
    got = pagerank(sym, iters=5).collect()
    assert len(got) == n_nodes
    if got:  # tiny sf may have no near-dup pairs (empty graph → empty ranks)
        assert abs(sum(r.rank for r in got) - 1.0) < 1e-9
