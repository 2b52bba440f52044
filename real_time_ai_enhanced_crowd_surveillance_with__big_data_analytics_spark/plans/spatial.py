"""Spatial plans: grid-bucketed proximity join, bounded nearest
neighbor, and crowd-density cells.

The reference's surveillance domain is inherently spatial (cameras at
sites, crowd density per location — main.py's crowd path counts people
per frame; a deployment with many cameras asks the same question per
PLACE). The test tables carry no coordinates, so — the
html_extract_quality pattern (VERDICT r6 #4) — both engines derive the
SAME deterministic integer site coordinates in-query and the real
spatial operators run on top; every rule sits inside the value hash.

Coordinates: one multiplicative hash ``H = (key * 2654435761) mod 2^32``
(Knuth's 32-bit golden-ratio multiplier, a public constant), split into
``x = H mod W`` and ``y = (H div W) mod W`` on a W=10,000 integer grid.
A pair of independent linear-congruential maps was measured first and rejected:
with ~1,500 keys the (x, y) points fall on a sparse torus lattice
(the classic LCG spectral-test failure) and NO pair lands within any
useful radius; splitting digit ranges of one wider hash scatters
properly (1,595 pairs at r=150, sf0.01). All arithmetic is int64 with
products < 2^46 — exact in both engines; distances compare squared
(no sqrt, no floats anywhere).

Operators (the epsilon-grid / PBSM posture every distributed spatial
engine uses — GeoSpark/Sedona partition-join, DuckDB spatial's grid):

- ``spatial_neighbor_pairs`` — all site pairs within radius r. Cell
  size = r, the left side replicated to its 3x3 neighbor cells, the
  right side keyed by home cell; an unordered pair is found EXACTLY
  once (b's home cell appears once in a's 9-cell expansion; a<b keeps
  one orientation), so no dedup pass. The join is an equi-join on
  (cell_x, cell_y) — shuffle-partitioned by cell, never a cross join.
- ``spatial_nearest_site`` — per site, the nearest other site within
  R, via a two-phase escalation ladder (fine grid resolves almost
  everyone; only fine-ring misses pay the full-R expansion) +
  min(struct(dist2, site)) argmin (deterministic tiebreak on site
  id). Bounded-NN semantics: sites with no neighbor inside R are
  absent.
- ``crowd_density_hotspots`` — events mapped to their user's site,
  aggregated per coarse grid cell: event count, distinct users, exact
  cent-sums of value (the round-margin-audit-proof idiom), error
  count, and a hot flag. No global window — the "rank the hotspots"
  step is a threshold predicate, keeping the registry's
  no-unbounded-window contract. Streaming twin + alarm-once alert in
  ``streaming/crowd_density.py`` and ``streaming/hot_cell_alert.py``.
- ``spatial_triangle_census`` — per-site cohesion of the tight
  adjacency graph via degree-ordered compact-forward triangle
  counting (see its docstring for the O(m^1.5) argument).
- ``spatial_two_hop_reach`` — fixed-depth BFS neighborhood size over
  the PAIR_RADIUS graph (exact; see its docstring for the
  sum(deg^2) lower bound and the HyperBall-at-scale note).

Scale: at 100 TB the only shuffles key on (cell_x, cell_y) — a
world-bounded key space the planner can size; the 9x left replication
is the standard grid-join cost and rides map-side. Density skew (a
stadium cell) is AQE-skew-join territory; the per-cell aggregate is
map-side combinable. Output of the pair join grows with true pair
count (quadratic in point DENSITY by spec, like dedup_minhash_lsh's
64x row) — the grid prunes candidates, not answers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

WORLD = 10_000
_MULT = 2_654_435_761  # Knuth multiplicative hash, public constant
_MOD = 4_294_967_296  # 2^32
PAIR_RADIUS = 150
NN_RADIUS = 400
NN_FINE = 50
TRI_RADIUS = 100  # census adjacency: tighter than the pair join —
# triangle work grows ~cubically in within-radius density, so the
# cohesion census runs on the tight-adjacency graph (and at real
# scale on a bounded stratum, the neardup_lsh_recall discipline)
HOT_CELL = 500
HOT_MIN_EVENTS = 40


def _coords(key: Column) -> tuple[Column, Column]:
    """Deterministic (x, y) on the W x W grid from one integer key.

    ``(h - h % W) / W`` is exact: the dividend is a multiple of W and
    the quotient (< 2^19) is a representable double, so the float
    division returns the exact integer — no engine-specific integer
    division semantics in play.
    """
    h = (key.cast("long") * F.lit(_MULT)) % F.lit(_MOD)
    x = h % WORLD
    y = ((h - h % WORLD) / WORLD).cast("long") % WORLD
    return x, y


def _cell(c: Column, size: int) -> Column:
    return ((c - c % size) / size).cast("long")


def _sites(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, "customer", sf)
    x, y = _coords(F.col("c_custkey"))
    return cust.select(
        F.col("c_custkey").alias("site"), x.alias("x"), y.alias("y")
    )


def _ring_candidates(
    left: DataFrame, right: DataFrame, radius: int
) -> DataFrame:
    """Ordered candidate pairs (site_a != site_b) whose cells are 3x3
    adjacent at cell size = radius, with exact squared distance.

    Ring guarantee (integer grid): every point within distance
    ``radius`` of a left point is in the 3x3 ring, and every point
    OUTSIDE the ring is strictly farther than ``radius`` (a
    non-adjacent cell starts >= radius+1 away on at least one axis).
    """
    one_ring = F.sequence(F.lit(-1), F.lit(1))
    a = (
        left.select(
            F.col("site").alias("site_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            _cell(F.col("x"), radius).alias("cxa"),
            _cell(F.col("y"), radius).alias("cya"),
        )
        .withColumn("dx", F.explode(one_ring))
        .withColumn("dy", F.explode(one_ring))
    )
    b = right.select(
        F.col("site").alias("site_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        _cell(F.col("x"), radius).alias("cxb"),
        _cell(F.col("y"), radius).alias("cyb"),
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    # spread the 9x-expanded probe side across the cluster by target
    # cell BEFORE the join: a single-file site scan otherwise leaves
    # the whole candidate evaluation on one task (the broadcast join's
    # probe side never shuffles on its own), serializing the
    # density-quadratic refine — measured 697 s -> ~20 s at the 8x
    # density probe. Explicit N: AQE folds keyless small repartitions
    # to one partition (verify-skill trap).
    a = a.repartition(
        left.sparkSession.sparkContext.defaultParallelism,
        a.cxa + a.dx,
        a.cya + a.dy,
    )
    return (
        a.join(
            b,
            (a.cxa + a.dx == b.cxb)
            & (a.cya + a.dy == b.cyb)
            & (a.site_a != b.site_b),
        )
        .withColumn("dist2", dist2.cast("long"))
        .where(F.col("dist2") <= radius * radius)
    )


_SITES_CTE = f"""
s AS (
  SELECT c_custkey AS site,
         ((c_custkey * {_MULT}) % {_MOD}) % {WORLD} AS x,
         (((c_custkey * {_MULT}) % {_MOD}) // {WORLD}) % {WORLD} AS y
  FROM customer
),
offs AS (
  SELECT dx, dy
  FROM (SELECT unnest([-1, 0, 1]) AS dx)
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy)
)
"""


def spatial_neighbor_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """All site pairs within PAIR_RADIUS, via the epsilon-grid join."""
    s = _sites(spark, sf)
    cands = _ring_candidates(s, s, PAIR_RADIUS)
    return cands.where(F.col("site_a") < F.col("site_b")).select(
        "site_a", "site_b", "dist2"
    )


SPATIAL_NEIGHBOR_PAIRS_SQL = f"""
WITH {_SITES_CTE},
g AS (SELECT site, x, y, x // {PAIR_RADIUS} AS cx, y // {PAIR_RADIUS} AS cy FROM s)
SELECT a.site AS site_a, b.site AS site_b,
       CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
         AS dist2
FROM g a
CROSS JOIN offs o
JOIN g b
  ON a.cx + o.dx = b.cx AND a.cy + o.dy = b.cy AND a.site < b.site
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        <= {PAIR_RADIUS} * {PAIR_RADIUS}
"""


def _argmin(cands: DataFrame) -> DataFrame:
    """argmin = min(struct(dist2, site_b)) — ties broken by smaller
    site id, deterministically, in one map-side-combinable aggregate
    (no per-site window sort)."""
    return (
        cands.groupBy(F.col("site_a").alias("site"))
        .agg(F.min(F.struct("dist2", "site_b")).alias("nn"))
        .select(
            "site",
            F.col("nn.site_b").alias("nn_site"),
            F.col("nn.dist2").alias("nn_dist2"),
        )
    )


def spatial_nearest_site(spark: SparkSession, sf: str) -> DataFrame:
    """Per site, the nearest other site within NN_RADIUS (bounded NN).

    Two-phase escalation ladder — the posture that keeps bounded NN
    from going density-quadratic at scale. Phase 1 probes a FINE grid
    (cell = NN_FINE): by the ring guarantee, a site with any candidate
    at dist <= NN_FINE sees its entire global argmin tie-set inside
    the fine ring (everything outside is strictly farther), so the
    fine argmin IS the answer. Only sites with no fine hit — a
    fraction that VANISHES as density grows (P ~ exp(-pi*density*
    NN_FINE^2)) — escalate to the full NN_RADIUS ring. A single-ring
    design was probed first and rejected: candidates per site grow
    with density * NN_RADIUS^2 (9x the disc), 100M+ refines at the 8x
    density probe; the ladder's phase-1 candidates grow with density *
    NN_FINE^2 (64x fewer) while phase 2 empties out.
    """
    s = _sites(spark, sf)
    fine = _ring_candidates(s, s, NN_FINE)  # already filtered <= NN_FINE^2
    resolved = _argmin(fine)
    unresolved = s.join(resolved.select("site"), "site", "left_anti")
    coarse = _ring_candidates(unresolved, s, NN_RADIUS)
    return resolved.unionByName(_argmin(coarse))


SPATIAL_NEAREST_SITE_SQL = f"""
WITH {_SITES_CTE},
g AS (SELECT site, x, y, x // {NN_RADIUS} AS cx, y // {NN_RADIUS} AS cy FROM s),
cand AS (
  SELECT a.site AS site, b.site AS site_b,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
  FROM g a
  CROSS JOIN offs o
  JOIN g b
    ON a.cx + o.dx = b.cx AND a.cy + o.dy = b.cy AND a.site != b.site
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {NN_RADIUS} * {NN_RADIUS}
)
SELECT site, site_b AS nn_site, CAST(dist2 AS BIGINT) AS nn_dist2
FROM cand
QUALIFY row_number() OVER (PARTITION BY site ORDER BY dist2, site_b) = 1
"""


def crowd_density_hotspots(spark: SparkSession, sf: str) -> DataFrame:
    """Per coarse grid cell: event density at the cell's user sites.

    Exact int64 everywhere: value is quantized to cents per row before
    summing (round-margin-audit-proof); counts are counts. The hot
    flag replaces a global rank — no unbounded window.
    """
    ev = load_table(spark, "events", sf)
    x, y = _coords(F.col("user_id"))
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.select(
            _cell(x, HOT_CELL).alias("cell_x"),
            _cell(y, HOT_CELL).alias("cell_y"),
            "user_id",
            "event_type",
            cents.alias("cents"),
        )
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("value_cents"),
            F.count_if(F.col("event_type") == "error").alias("n_errors"),
        )
        .withColumn("hot", F.col("n_events") >= HOT_MIN_EVENTS)
    )


CROWD_DENSITY_HOTSPOTS_SQL = f"""
WITH mapped AS (
  SELECT (((user_id * {_MULT}) % {_MOD}) % {WORLD}) // {HOT_CELL} AS cell_x,
         ((((user_id * {_MULT}) % {_MOD}) // {WORLD}) % {WORLD})
           // {HOT_CELL} AS cell_y,
         user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT cell_x, cell_y,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(cents) AS BIGINT) AS value_cents,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       COUNT(*) >= {HOT_MIN_EVENTS} AS hot
FROM mapped
GROUP BY cell_x, cell_y
"""


def spatial_triangle_census(spark: SparkSession, sf: str) -> DataFrame:
    """Per-site triangle census of the within-TRI_RADIUS adjacency
    graph: degree, triangle count, wedge count, and an integer local
    clustering coefficient (micro-units) — the cohesion signal that
    separates a dense site CLUSTER (high closure: a crowd hotspot
    zone) from a chain of pairwise-close sites.

    Algorithm is degree-ordered compact-forward — THE distributed
    triangle-counting posture (Suri & Vassilvitskii's MR-friendly
    variant): orient every undirected edge from the lower-(degree, id)
    endpoint to the higher, wedge-join arcs on their source, and close
    each wedge against the arc set. Degree ordering bounds every
    node's out-degree by O(sqrt(m)), so the wedge join is
    O(m^{3/2}) worst-case instead of sum(d^2) — the skew-proofing
    that matters when one site sits in a stadium cell. Each triangle
    is produced exactly once (its vertices are totally ordered), then
    credited to all three corners. All arithmetic int64:
    wedges = d*(d-1)/2 exact, lcc_micro = triangles*1e6 div wedges
    (floor in both engines); sites with degree < 2 carry NULL.
    """
    # materialize the grid-join edge set once: it is referenced by the
    # degree count, both orientation joins, both wedge sides, and the
    # closure join — without truncation the whole epsilon-grid join
    # re-executes per reference (the label_propagation discipline;
    # output-sized frame, so the .rdd-path cost is bounded)
    s = _sites(spark, sf)
    pairs = (
        _ring_candidates(s, s, TRI_RADIUS)
        .where(F.col("site_a") < F.col("site_b"))
        .select(F.col("site_a").alias("ia"), F.col("site_b").alias("ib"))
        .localCheckpoint()
    )
    edges = pairs.union(
        pairs.select(F.col("ib").alias("ia"), F.col("ia").alias("ib"))
    )
    deg = edges.groupBy(F.col("ia").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    p = (
        pairs.join(
            deg.select(F.col("node").alias("ia"), F.col("d").alias("da")),
            "ia",
        )
        .join(
            deg.select(F.col("node").alias("ib"), F.col("d").alias("db")),
            "ib",
        )
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ia") < F.col("ib"))
    )
    # arcs enter the wedge join twice and the closure once — same
    # materialize-once reasoning (|arcs| == |pairs|)
    arcs = p.select(
        F.when(fwd, F.col("ia")).otherwise(F.col("ib")).alias("u"),
        F.when(fwd, F.col("ib")).otherwise(F.col("ia")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint()
    a1 = arcs.select(
        F.col("u"), F.col("v").alias("w1"), F.col("dv").alias("dw1")
    )
    a2 = arcs.select(
        F.col("u"), F.col("v").alias("w2"), F.col("dv").alias("dw2")
    )
    wedge = a1.join(a2, "u").where(
        (F.col("dw1") < F.col("dw2"))
        | ((F.col("dw1") == F.col("dw2")) & (F.col("w1") < F.col("w2")))
    )
    tri = wedge.join(
        arcs.select(F.col("u").alias("w1"), F.col("v").alias("w2")),
        ["w1", "w2"],
    ).select("u", "w1", "w2")
    tcnt = (
        tri.select(
            F.explode(F.array("u", "w1", "w2")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    sites = s.select(F.col("site"))
    d = F.coalesce(F.col("d"), F.lit(0))
    t = F.coalesce(F.col("t"), F.lit(0))
    wedges = (d * (d - 1) / 2).cast("long")
    return (
        sites.join(deg, sites.site == deg.node, "left")
        .drop("node")
        .join(tcnt, sites.site == tcnt.node, "left")
        .drop("node")
        .select(
            "site",
            d.alias("degree"),
            t.alias("triangles"),
            wedges.alias("wedges"),
        )
        .select(
            "site",
            "degree",
            "triangles",
            "wedges",
            F.expr(
                "CASE WHEN degree >= 2"
                " THEN (triangles * 1000000) div wedges"
                " ELSE NULL END"
            ).alias("lcc_micro"),
        )
    )


SPATIAL_TRIANGLE_CENSUS_SQL = f"""
WITH {_SITES_CTE},
g AS (SELECT site, x, y, x // {TRI_RADIUS} AS cx, y // {TRI_RADIUS} AS cy FROM s),
p AS (
  SELECT a.site AS ia, b.site AS ib
  FROM g a
  CROSS JOIN offs o
  JOIN g b
    ON a.cx + o.dx = b.cx AND a.cy + o.dy = b.cy AND a.site < b.site
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {TRI_RADIUS} * {TRI_RADIUS}
),
edges AS (SELECT ia, ib FROM p UNION ALL SELECT ib, ia FROM p),
deg AS (SELECT ia AS node, count(*) AS d FROM edges GROUP BY ia),
arcs AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND p.ia < p.ib)
              THEN p.ia ELSE p.ib END AS u,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND p.ia < p.ib)
              THEN p.ib ELSE p.ia END AS v,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND p.ia < p.ib)
              THEN db.d ELSE da.d END AS dv
  FROM p JOIN deg da ON p.ia = da.node JOIN deg db ON p.ib = db.node
),
wedge AS (
  SELECT a1.u, a1.v AS w1, a2.v AS w2
  FROM arcs a1 JOIN arcs a2 ON a1.u = a2.u
  WHERE a1.dv < a2.dv OR (a1.dv = a2.dv AND a1.v < a2.v)
),
tri AS (
  SELECT w.u, w.w1, w.w2
  FROM wedge w JOIN arcs a ON a.u = w.w1 AND a.v = w.w2
),
tcnt AS (
  SELECT node, count(*) AS t FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT w1 FROM tri
    UNION ALL SELECT w2 FROM tri
  ) GROUP BY node
)
SELECT s.site,
       CAST(coalesce(d.d, 0) AS BIGINT) AS degree,
       CAST(coalesce(t.t, 0) AS BIGINT) AS triangles,
       CAST(coalesce(d.d, 0) * (coalesce(d.d, 0) - 1) // 2 AS BIGINT)
         AS wedges,
       CASE WHEN coalesce(d.d, 0) >= 2
            THEN CAST(coalesce(t.t, 0) * 1000000
                      // (d.d * (d.d - 1) // 2) AS BIGINT)
            ELSE NULL END AS lcc_micro
FROM s
LEFT JOIN deg d ON s.site = d.node
LEFT JOIN tcnt t ON s.site = t.node
"""


def spatial_two_hop_reach(spark: SparkSession, sf: str) -> DataFrame:
    """Per site: distinct sites reachable in exactly <=1 and <=2 hops
    of the PAIR_RADIUS adjacency graph (self excluded) — the bounded-
    depth BFS that estimates how far a disturbance at one site can
    propagate through chained proximity. Complements the triangle
    census (closure) with REACH: a site in a long corridor has low
    closure but high 2-hop reach.

    Shape: one self-join of the symmetrized edge set on the middle
    node + a distinct count — the standard 2-hop neighborhood plan.
    Fixed depth keeps it oracle-expressible; deeper reach belongs to
    the iterative CC/PageRank operators.

    Scale honesty: EXACT distinct reach counts have an intrinsic work
    lower bound of sum(deg^2) (every 2-hop path must be witnessed),
    so the 8x density probe reads ~2x linear-in-that-work (122x vs
    the 64x deg^2 growth) — this is the spec's cost, not a plan
    defect, and it is why neighborhood functions at web scale are
    estimated with mergeable sketches (HyperBall/HyperANF's HLL per
    hop) instead of enumerated. At 100 TB this exact form runs on a
    bounded stratum (the neardup_lsh_recall discipline) or swaps the
    distinct for approx_count_distinct, trading oracle hash parity
    for the sketch.
    """
    s = _sites(spark, sf)
    pairs = (
        _ring_candidates(s, s, PAIR_RADIUS)
        .where(F.col("site_a") < F.col("site_b"))
        .select(F.col("site_a").alias("ia"), F.col("site_b").alias("ib"))
        .localCheckpoint()
    )
    edges = pairs.union(
        pairs.select(F.col("ib").alias("ia"), F.col("ia").alias("ib"))
    )
    one = edges.groupBy(F.col("ia").alias("site")).agg(
        F.count("*").alias("n_1hop")  # exact: edges are distinct pairs
    )
    e2 = edges.select(F.col("ia").alias("src"), F.col("ib").alias("mid"))
    hop2 = (
        e2.join(
            edges.select(
                F.col("ia").alias("mid"), F.col("ib").alias("dst")
            ),
            "mid",
        )
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .union(e2.select(F.col("src"), F.col("mid").alias("dst")))
        .groupBy(F.col("src").alias("site"))
        .agg(F.countDistinct("dst").alias("n_2hop"))
    )
    return (
        s.select("site")
        .join(one, "site", "left")
        .join(hop2, "site", "left")
        .select(
            "site",
            F.coalesce("n_1hop", F.lit(0)).alias("n_1hop"),
            F.coalesce("n_2hop", F.lit(0)).alias("n_2hop"),
        )
    )


def spatial_two_hop_reach_approx(spark: SparkSession, sf: str) -> DataFrame:
    """HyperANF-style sketched 2-hop reach (VERDICT r8 Next #4) — the
    100 TB alternative `spatial_two_hop_reach`'s docstring promises:
    instead of witnessing every 2-hop PATH (the exact form's intrinsic
    Σdeg² lower bound), each node aggregates ONE DataSketches HLL of
    its neighbors, and a node's 2-hop reach is the UNION of its
    neighbors' sketches — Σdeg bounded-size sketch merges, the
    HyperBall/HyperANF neighborhood-function recurrence (Boldi &
    Vigna, WWW'11) truncated at radius 2.

    Accounting parity with the exact spec: the merged union estimates
    ``|N₂ ∪ N₁ ∪ {src}|`` (src sits in every neighbor's sketch when
    deg ≥ 1), and the exact ``n_2hop`` counts ``(N₂ ∪ N₁) ∖ {src}`` —
    so the estimate subtracts 1. Estimates round to the nearest long.

    Cost shape the probe measures: the hop-2 shuffle moves one sketch
    per EDGE (Σdeg rows of ≤ ~1.5 KB HLL_4 state) instead of one row
    per PATH (Σdeg²); merging is associative/commutative so Spark
    partial-aggregates map-side. Estimated counts carry DataSketches
    HLL_4 lgK=12 error (~1.6% RSE, bounded in test_two_hop_approx at
    5% against the exact anchor). No SQL oracle: sketch internals are
    engine-specific (rows-only driver check; the TEST is the gate).
    """
    s = _sites(spark, sf)
    pairs = (
        _ring_candidates(s, s, PAIR_RADIUS)
        .where(F.col("site_a") < F.col("site_b"))
        .select(F.col("site_a").alias("ia"), F.col("site_b").alias("ib"))
        .localCheckpoint()
    )
    # self-loops fold the "union the node's own sketch" branch into the
    # recurrence itself (r10, guide §2.4): with (v, v) present,
    # round-1 sketches are HLL{N(v) ∪ {v}} and the round-2 join over
    # mid ∈ N(v) ∪ {v} covers N₂ ∪ N₁ ∪ {src} in ONE aggregate — the
    # old plan re-executed the round-1 aggregate THREE times (mid join,
    # own-sketch union branch, deg join) because the union duplicated
    # its unmaterialized subtree. Estimates are identical: an HLL of
    # the same set has the same registers however it was built, and
    # for deg ≥ 1 the union set already contained src; deg-0 sites
    # read est({v}) − 1 = 0, exactly the coalesce(0) they read before.
    edges = pairs.union(
        pairs.select(F.col("ib").alias("ia"), F.col("ia").alias("ib"))
    ).union(s.select(F.col("site").alias("ia"), F.col("site").alias("ib")))
    sk1 = (
        edges.groupBy(F.col("ia").alias("site"))
        .agg(
            F.hll_sketch_agg("ib").alias("sk"),
            # exact: edges are distinct pairs; one row is the self-loop
            (F.count("*") - 1).alias("deg"),
        )
        .localCheckpoint()
    )
    two = (
        edges.select(F.col("ia").alias("src"), F.col("ib").alias("mid"))
        .join(sk1.select(F.col("site").alias("mid"), "sk"), "mid")
        .groupBy(F.col("src").alias("site"))
        .agg(F.hll_union_agg("sk").alias("sk2"))
        .select(
            "site",
            (F.round(F.hll_sketch_estimate("sk2")) - 1)
            .cast("long")
            .alias("n_2hop_est"),
        )
    )
    return (
        sk1.select("site", "deg")
        .join(two, "site", "left")
        .select(
            "site",
            F.col("deg").alias("n_1hop"),
            F.coalesce("n_2hop_est", F.lit(0)).alias("n_2hop_est"),
        )
    )


SPATIAL_TWO_HOP_REACH_SQL = f"""
WITH {_SITES_CTE},
g AS (SELECT site, x, y, x // {PAIR_RADIUS} AS cx, y // {PAIR_RADIUS} AS cy FROM s),
p AS (
  SELECT a.site AS ia, b.site AS ib
  FROM g a
  CROSS JOIN offs o
  JOIN g b
    ON a.cx + o.dx = b.cx AND a.cy + o.dy = b.cy AND a.site < b.site
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {PAIR_RADIUS} * {PAIR_RADIUS}
),
edges AS (SELECT ia, ib FROM p UNION ALL SELECT ib, ia FROM p),
one AS (SELECT ia AS site, count(DISTINCT ib) AS n_1hop FROM edges GROUP BY ia),
two AS (
  SELECT src AS site, count(DISTINCT dst) AS n_2hop FROM (
    SELECT e1.ia AS src, e2.ib AS dst
    FROM edges e1 JOIN edges e2 ON e1.ib = e2.ia
    WHERE e1.ia != e2.ib
    UNION
    SELECT ia AS src, ib AS dst FROM edges
  ) GROUP BY src
)
SELECT s.site,
       CAST(coalesce(one.n_1hop, 0) AS BIGINT) AS n_1hop,
       CAST(coalesce(two.n_2hop, 0) AS BIGINT) AS n_2hop
FROM s
LEFT JOIN one ON s.site = one.site
LEFT JOIN two ON s.site = two.site
"""


COLOC_CELL = 1_000
COLOC_BAND_US = 30 * 60 * 1_000_000  # 30 minutes, integer microseconds


def colocation_encounters(spark: SparkSession, sf: str) -> DataFrame:
    """Co-location contact graph: distinct-user event pairs in the
    same COLOC_CELL grid cell within COLOC_BAND_US of each other —
    who was at the same place at the same time, how often, and when
    first/last. The surveillance question behind contact tracing and
    tailgating detection, and the canonical SPATIO-TEMPORAL band
    join: the equi-join key is (cell_x, cell_y, time_bucket), so the
    shuffle is bounded by place x time, never a per-user or global
    cross join.

    Band-join exactness: with bucket size = band, two events within
    the band are at most one bucket apart, so expanding ONE side to
    buckets {b-1, b, b+1} and keying the other by home bucket finds
    every qualifying event pair exactly once (home bucket appears
    once in the expansion; user_a < user_b fixes orientation). The
    |delta| <= band refine runs on exact int64 microseconds
    (unix_micros / epoch_us — identical in both engines; no float
    seconds anywhere).

    At 100 TB: time buckets shard the stream axis (the timeseries.py
    discipline), cells shard space; a skewed (stadium, rush-hour)
    bucket is AQE-skew-join territory. Encounter counts grow with
    true co-presence BY SPEC — the join prunes candidates to the
    3-bucket band, not answers.
    """
    ev = load_table(spark, "events", sf)
    x, y = _coords(F.col("user_id"))
    us = F.unix_micros(F.col("ts"))
    m = ev.select(
        "user_id",
        "ts",
        us.alias("us"),
        _cell(x, COLOC_CELL).alias("cx"),
        _cell(y, COLOC_CELL).alias("cy"),
        _cell(us, COLOC_BAND_US).alias("bkt"),
    )
    a = (
        m.select(
            F.col("user_id").alias("user_a"),
            F.col("ts").alias("ts_a"),
            F.col("us").alias("us_a"),
            "cx",
            "cy",
            "bkt",
        )
        .withColumn("shift", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("bkt", F.col("bkt") + F.col("shift"))
        .drop("shift")
    )
    b = m.select(
        F.col("user_id").alias("user_b"),
        F.col("ts").alias("ts_b"),
        F.col("us").alias("us_b"),
        "cx",
        "cy",
        "bkt",
    )
    pairs = a.join(b, ["cx", "cy", "bkt"]).where(
        (F.col("user_a") < F.col("user_b"))
        & (
            F.abs(F.col("us_a") - F.col("us_b"))
            <= F.lit(COLOC_BAND_US)
        )
    )
    return pairs.groupBy("user_a", "user_b", "cx", "cy").agg(
        F.count(F.lit(1)).alias("n_encounters"),
        F.date_format(
            F.min(F.least("ts_a", "ts_b")), "yyyy-MM-dd HH:mm:ss"
        ).alias("first_ts"),
        F.date_format(
            F.max(F.greatest("ts_a", "ts_b")), "yyyy-MM-dd HH:mm:ss"
        ).alias("last_ts"),
    )


COLOCATION_ENCOUNTERS_SQL = f"""
WITH m AS (
  SELECT user_id, ts, epoch_us(ts) AS us,
         (((user_id * {_MULT}) % {_MOD}) % {WORLD}) // {COLOC_CELL} AS cx,
         ((((user_id * {_MULT}) % {_MOD}) // {WORLD}) % {WORLD})
           // {COLOC_CELL} AS cy,
         epoch_us(ts) // {COLOC_BAND_US} AS bkt
  FROM events
),
a AS (
  SELECT user_id AS user_a, ts AS ts_a, us AS us_a, cx, cy,
         bkt + s.shift AS bkt
  FROM m CROSS JOIN (SELECT unnest([-1, 0, 1]) AS shift) s
),
b AS (
  SELECT user_id AS user_b, ts AS ts_b, us AS us_b, cx, cy, bkt FROM m
)
SELECT user_a, user_b, cx, cy,
       count(*) AS n_encounters,
       strftime(min(least(ts_a, ts_b)), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(max(greatest(ts_a, ts_b)), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM a JOIN b USING (cx, cy, bkt)
WHERE user_a < user_b AND abs(us_a - us_b) <= {COLOC_BAND_US}
GROUP BY user_a, user_b, cx, cy
"""


MIN_FLOW = 3


def od_flow_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Origin-destination flow matrix over the camera-cell grid: each
    event is observed at the cell of its camera (coords hashed from
    event_id — per-event, so subjects MOVE, unlike the static user
    sites), and a flow edge is a user's transition between consecutive
    observations. The crowd-movement readout the reference's
    multi-camera deployment would feed a heat-map from — where do
    people go next, and how far.

    Output: (from, to) cell pairs carrying ≥ MIN_FLOW transitions,
    with the transition count, distinct movers, and the Chebyshev cell
    distance (0 = dwell within one cell). Exact integers throughout.

    Scale: one user-keyed shuffle for the lag chain (the sessionize
    posture), then a partial-aggregated groupBy onto the (from, to)
    cell-pair grid — ≤ (cells)² keys regardless of event count, and
    the MIN_FLOW cut keeps the emitted matrix to the flows a heat-map
    would draw.
    """
    ev = load_table(spark, "events", sf)
    x, y = _coords(F.col("event_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = ev.select(
        "user_id",
        "ts",
        "event_id",
        _cell(x, HOT_CELL).alias("cx"),
        _cell(y, HOT_CELL).alias("cy"),
    )
    edges = (
        pos.withColumn("to_x", F.lead("cx").over(w))
        .withColumn("to_y", F.lead("cy").over(w))
        .filter(F.col("to_x").isNotNull())
    )
    return (
        edges.groupBy(
            F.col("cx").alias("from_x"),
            F.col("cy").alias("from_y"),
            "to_x",
            "to_y",
        )
        .agg(
            F.count("*").alias("n_transitions"),
            F.countDistinct("user_id").alias("n_movers"),
        )
        .filter(F.col("n_transitions") >= MIN_FLOW)
        .withColumn(
            "cell_dist",
            F.greatest(
                F.abs(F.col("from_x") - F.col("to_x")),
                F.abs(F.col("from_y") - F.col("to_y")),
            ),
        )
    )


_OD_CELL = (
    f"((((event_id * {_MULT}) % {_MOD}) % {WORLD}) // {HOT_CELL})",
    f"(((((event_id * {_MULT}) % {_MOD}) // {WORLD}) % {WORLD}) // {HOT_CELL})",
)

OD_FLOW_MATRIX_SQL = f"""
WITH pos AS (
  SELECT user_id, ts, event_id,
         {_OD_CELL[0]} AS cx, {_OD_CELL[1]} AS cy
  FROM events
), edges AS (
  SELECT user_id, cx, cy,
         lead(cx) OVER uw AS to_x,
         lead(cy) OVER uw AS to_y
  FROM pos
  WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
), flows AS (
  SELECT cx AS from_x, cy AS from_y, to_x, to_y,
         CAST(count(*) AS BIGINT) AS n_transitions,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_movers
  FROM edges WHERE to_x IS NOT NULL
  GROUP BY 1, 2, 3, 4
)
SELECT from_x, from_y, to_x, to_y, n_transitions, n_movers,
       greatest(abs(from_x - to_x), abs(from_y - to_y)) AS cell_dist
FROM flows WHERE n_transitions >= {MIN_FLOW}
"""


LOITER_CELL = 2500   # coarse zone grid (4×4): dwell runs need collision mass
LOITER_MIN_OBS = 3   # consecutive same-zone observations to call it loitering


def loiter_episodes(spark: SparkSession, sf: str) -> DataFrame:
    """Loitering detection — the surveillance alert the reference's
    crowding threshold gestures at but can't express without history:
    maximal runs of ≥ LOITER_MIN_OBS consecutive observations of one
    subject inside one coarse zone, with the dwell duration. Classic
    gaps-and-islands: a new island starts when the zone changes, the
    island id is the running count of changes, episodes aggregate per
    (user, island).

    Exact integers: zone from the event_id coordinate hash, duration
    in whole seconds from the micro-exact timestamps.

    Scale: one user-keyed shuffle carries the lag + running-sum chain
    AND the (user, island) aggregation (same partitioning, no second
    shuffle); episode output is bounded by the run structure, and the
    MIN_OBS cut keeps it alert-sized.
    """
    ev = load_table(spark, "events", sf)
    x, y = _coords(F.col("event_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = ev.select(
        "user_id",
        "ts",
        "event_id",
        _cell(x, LOITER_CELL).alias("zx"),
        _cell(y, LOITER_CELL).alias("zy"),
    )
    runs = (
        pos.withColumn(
            "chg",
            (
                (F.col("zx") != F.lag("zx").over(w))
                | (F.col("zy") != F.lag("zy").over(w))
            )
            .cast("long"),
        )
        .withColumn("chg", F.coalesce("chg", F.lit(1)))
        .withColumn(
            "island",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        runs.groupBy("user_id", "island")
        .agg(
            F.max("zx").alias("zone_x"),
            F.max("zy").alias("zone_y"),
            F.count("*").alias("n_obs"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "dwell_start"
            ),
            (
                F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))
            ).alias("duration_s"),
        )
        .filter(F.col("n_obs") >= LOITER_MIN_OBS)
        .drop("island")
    )


LOITER_EPISODES_SQL = f"""
WITH pos AS (
  SELECT user_id, ts, event_id,
         (((event_id * {_MULT}) % {_MOD}) % {WORLD}) // {LOITER_CELL} AS zx,
         ((((event_id * {_MULT}) % {_MOD}) // {WORLD}) % {WORLD})
           // {LOITER_CELL} AS zy
  FROM events
), runs AS (
  SELECT *,
         CASE WHEN zx IS DISTINCT FROM lag(zx) OVER uw
               OR zy IS DISTINCT FROM lag(zy) OVER uw THEN 1 ELSE 0 END AS chg
  FROM pos
  WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
), islands AS (
  SELECT *,
         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS island
  FROM runs
)
SELECT user_id,
       CAST(max(zx) AS BIGINT) AS zone_x,
       CAST(max(zy) AS BIGINT) AS zone_y,
       CAST(count(*) AS BIGINT) AS n_obs,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS dwell_start,
       CAST(max(epoch_us(ts) // 1000000)
            - min(epoch_us(ts) // 1000000) AS BIGINT) AS duration_s
FROM islands
GROUP BY user_id, island
HAVING count(*) >= {LOITER_MIN_OBS}
"""


SPATIAL_QUERIES = {
    "loiter_episodes": (loiter_episodes, LOITER_EPISODES_SQL),
    "od_flow_matrix": (od_flow_matrix, OD_FLOW_MATRIX_SQL),
    "spatial_neighbor_pairs": (
        spatial_neighbor_pairs,
        SPATIAL_NEIGHBOR_PAIRS_SQL,
    ),
    "spatial_nearest_site": (spatial_nearest_site, SPATIAL_NEAREST_SITE_SQL),
    "crowd_density_hotspots": (
        crowd_density_hotspots,
        CROWD_DENSITY_HOTSPOTS_SQL,
    ),
    "spatial_triangle_census": (
        spatial_triangle_census,
        SPATIAL_TRIANGLE_CENSUS_SQL,
    ),
    "colocation_encounters": (
        colocation_encounters,
        COLOCATION_ENCOUNTERS_SQL,
    ),
    "spatial_two_hop_reach": (
        spatial_two_hop_reach,
        SPATIAL_TWO_HOP_REACH_SQL,
    ),
    # sketch estimates are engine-specific (DataSketches HLL) — no
    # ANSI-SQL oracle exists; the driver records a rows-only check and
    # test_two_hop_approx bounds the per-row error vs the exact anchor
    "spatial_two_hop_reach_approx": (spatial_two_hop_reach_approx, None),
}
