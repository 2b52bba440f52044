"""Distributed PageRank over an edge DataFrame (graph analytics
companion to ``connected_components`` and the triangle census — on the
near-dup graph, rank concentrates on template/mirror hubs, which is a
canonicalization signal the plain cluster size misses).

Same driver-iterated shape as the other fixed-point operators: each
round is one join (ranks ⋈ edges on the high-cardinality src key —
both sides hash-partition evenly) + one groupBy(dst) sum, then
``localCheckpoint`` truncates the lineage so round N's plan doesn't
replay rounds 1..N-1. The only driver-side state is two scalars per
round (node count, dangling mass — both one-row aggregates). Dangling
nodes redistribute their mass uniformly, the standard treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Ranks after ``iters`` power iterations; returns (node, rank)
    summing to 1. Edges are directed — symmetrize first for an
    undirected graph."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # (node, deg) with deg NULL for dangling nodes; checkpointed once,
    # reused every round
    base = nodes.join(deg, nodes.node == deg.src, "left").select(
        "node", "deg"
    ).localCheckpoint()
    ranks = base.select("node", "deg", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        dangling = (
            ranks.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, ranks.node == e.src)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            base.join(contribs, base.node == contribs.dst, "left")
            .select(
                "node",
                "deg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", "rank")
