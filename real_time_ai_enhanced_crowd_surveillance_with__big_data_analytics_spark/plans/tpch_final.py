"""Remaining decision-support shapes (TPC-H Q6/Q8/Q9/Q12/Q16/Q19/Q20
analogs) — completes the historical-analytics layer the reference
promises but never built (reference README.md:2; paper p.3 "historical
trend analysis for predictive modeling").

The driver schema is reduced TPC-H (no partsupp, no l_shipmode /
l_commitdate, fewer part columns — TESTDATA.md), so each analog keeps
the *shape* that matters for the optimizer while deriving any missing
column deterministically from keys (same derivation on both engines):

- Q6: single-table scan-heavy filter + agg — the predicate-pushdown /
  no-join baseline every columnar engine is judged on.
- Q8: two-level dimension snowflake (customer→nation→region) with a
  conditional-share aggregate over year buckets.
- Q9: multi-fact-dimension star join with a computed profit measure,
  grouped by (nation, year).
- Q12: fact-fact join + conditional counts grouped by a derived
  dispatch column (ship mode).
- Q16: distinct-count aggregate over a many-many relationship with a
  NOT-IN exclusion decorrelated to an anti-join.
- Q19: disjunctive mixed fact/dimension predicate riding an equi-join —
  Catalyst must split the OR into the join residual, keeping the
  partkey equi-join (a naive engine degrades to a cross product).
- Q20: nested correlated aggregates at two granularities feeding a
  semi-join (dominant-shipper selection).

Float parity: money sums go through exact integer cents
(``round(x*100)`` as BIGINT) so Spark's summation order can't flip low
bits vs DuckDB (plans/tpch_extra.py conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


# --- Q6: forecast revenue change ---------------------------------------------

def forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue delta from discount tweaks: one scan, three pushed-down
    predicates, no join (TPC-H Q6). Discounts are exact hundredths in
    the data, so ``discount_bp`` (basis points as long) times price
    cents is an exact integer product; the single global sum divides
    once at the end. The filter and the two projected columns reach the
    parquet scan (PushedFilters + pruned ReadSchema)."""
    li = load_table(spark, "lineitem", sf)
    return (
        li.filter(
            (F.year("l_shipdate") == 1996)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(_cents(F.col("l_extendedprice")) * _cents(F.col("l_discount")))
                / 10000.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


FORECAST_REVENUE_SQL = """
SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0, 2)
         AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE year(l_shipdate) = 1996
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --- Q8: market share --------------------------------------------------------

MKT_REGION = "ASIA"
MKT_PART_TYPE = "PROMO"
MKT_NATION = "NATION_3"


def market_share(spark: SparkSession, sf: str) -> DataFrame:
    """NATION_3's share of PROMO-part revenue sold to ASIA customers,
    per order year (TPC-H Q8). The snowflake (customer→nation→region)
    and both small dims broadcast; the only fact-fact shuffle is
    lineitem⋈orders on orderkey. The share is a conditional sum over
    the same rows — one aggregate, no second scan."""
    li = load_table(spark, "lineitem", sf)
    orders = load_table(spark, "orders", sf)
    cust = load_table(spark, "customer", sf)
    supp = load_table(spark, "supplier", sf)
    nation = load_table(spark, "nation", sf)
    region = load_table(spark, "region", sf)
    part = load_table(spark, "part", sf)

    asia_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == MKT_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("cust_nk"))
    )
    promo_parts = part.filter(F.col("p_type") == MKT_PART_TYPE).select("p_partkey")
    supp_nation = supp.join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    vol = F.col("vol_cents")
    return (
        li.join(F.broadcast(promo_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cust_nk")
        )
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "vol_cents"
            ),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == MKT_NATION, vol).otherwise(0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol) / 100.0, 2).alias("total_volume"),
        )
    )


MARKET_SHARE_SQL = f"""
WITH vols AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS vol_cents,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{MKT_PART_TYPE}'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = '{MKT_REGION}'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = '{MKT_NATION}' THEN vol_cents
                      ELSE 0 END) * 1.0 / sum(vol_cents), 6) AS mkt_share,
       round(sum(vol_cents) / 100.0, 2) AS total_volume
FROM vols
GROUP BY o_year
"""


# --- Q9: product-line profit -------------------------------------------------

PROFIT_PART_LIKE = "%widget%"
SUPPLY_COST_RATE = 0.1  # no partsupp in the driver schema: unit supply
#                         cost derives as 10% of p_retailprice


def product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """Profit on widget parts by supplier nation and order year (TPC-H
    Q9). Profit per line = revenue − derived supply cost, rounded to
    cents per row so both engines sum identical longs. part prunes
    ~linearly via the name filter before the join; supplier→nation
    broadcasts; lineitem⋈orders is the one big shuffle."""
    li = load_table(spark, "lineitem", sf)
    orders = load_table(spark, "orders", sf)
    supp = load_table(spark, "supplier", sf)
    nation = load_table(spark, "nation", sf)
    part = load_table(spark, "part", sf)

    widget_parts = part.filter(F.col("p_name").like(PROFIT_PART_LIKE)).select(
        "p_partkey", "p_retailprice"
    )
    supp_nation = supp.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit_cents = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * SUPPLY_COST_RATE
    )
    return (
        li.join(F.broadcast(widget_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            profit_cents.alias("pc"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("pc") / 100.0, 2).alias("profit"))
    )


PRODUCT_PROFIT_SQL = f"""
SELECT sn.n_name AS nation, year(o.o_orderdate) AS o_year,
       round(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                  - p.p_retailprice * l.l_quantity * {SUPPLY_COST_RATE}) * 100)
                 AS BIGINT)) / 100.0, 2) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
           AND p.p_name LIKE '{PROFIT_PART_LIKE}'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY sn.n_name, year(o.o_orderdate)
"""


# --- Q12: ship-mode priority counts ------------------------------------------

SHIP_MODES = ["MAIL", "SHIP", "TRUCK"]


def _ship_mode() -> F.Column:
    """Deterministic stand-in for the missing l_shipmode column."""
    idx = ((F.col("l_orderkey") + F.col("l_linenumber")) % 3).cast("int")
    return F.element_at(F.array(*[F.lit(m) for m in SHIP_MODES]), idx + 1)


def shipmode_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Urgent-vs-other order counts per ship mode for 1997 shipments
    (TPC-H Q12): fact-fact equi-join on orderkey, then conditional
    counts grouped by the derived dispatch column. The year predicate
    prunes lineitem before the shuffle."""
    li = load_table(spark, "lineitem", sf)
    orders = load_table(spark, "orders", sf)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(F.year("l_shipdate") == 1997)
        .select("l_orderkey", _ship_mode().alias("ship_mode"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("ship_mode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SHIPMODE_PRIORITY_SQL = """
SELECT (['MAIL', 'SHIP', 'TRUCK'])[CAST((l.l_orderkey + l.l_linenumber) % 3
                                        AS INT) + 1] AS ship_mode,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE year(l.l_shipdate) = 1997
GROUP BY 1
"""


# --- Q16: supplier counts by part attribute ----------------------------------

Q16_SIZES = [1, 4, 9, 16, 25, 36, 49]


def supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct suppliers able to ship each (brand, type, size) bucket,
    excluding flagged suppliers (TPC-H Q16; the complaints NOT-IN
    becomes an anti-join against negative-balance suppliers). The
    supplier⇄part relationship derives from shipped lineitems —
    distinct-first so the join input is the relationship set, not the
    fact table."""
    li = load_table(spark, "lineitem", sf)
    part = load_table(spark, "part", sf)
    supp = load_table(spark, "supplier", sf)
    rel = li.select("l_partkey", "l_suppkey").distinct()
    flagged = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(Q16_SIZES)
    )
    return (
        rel.join(flagged, rel.l_suppkey == flagged.s_suppkey, "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SUPPLIER_PART_COUNTS_SQL = f"""
WITH rel AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT r.l_suppkey) AS supplier_cnt
FROM rel r
JOIN part p ON r.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN ({', '.join(str(s) for s in Q16_SIZES)})
  AND r.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


# --- Q19: disjunctive predicate revenue --------------------------------------

def disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue from three brand/size/quantity bands OR-ed together
    (TPC-H Q19). The partkey equi-join must survive predicate
    splitting: Catalyst keeps the conjunct common to all branches
    (the join key) as the join condition and evaluates the OR as the
    join residual — the plan stays a broadcast/shuffled hash join, not
    a cross product. One output row (exact-cents sum)."""
    li = load_table(spark, "lineitem", sf)
    part = load_table(spark, "part", sf)
    q = F.col("l_quantity")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            F.round(
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


DISJUNCTIVE_REVENUE_SQL = """
SELECT round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                 AS BIGINT)) / 100.0, 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# --- Q20: dominant shippers --------------------------------------------------

DOMINANT_YEAR = 1998
DOMINANT_SHARE = 0.3


def dominant_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """Suppliers who shipped > 30% of any small-named part's 1998
    volume (TPC-H Q20's nested correlated aggregate, decorrelated):
    the inner per-(part, supplier) aggregate joins the per-part total
    on partkey — the correlation key — and the surviving pairs
    semi-join supplier. Quantities stay exact cents until the final
    share division."""
    li = load_table(spark, "lineitem", sf)
    part = load_table(spark, "part", sf)
    supp = load_table(spark, "supplier", sf)
    small_parts = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    shipped = (
        li.filter(F.year("l_shipdate") == DOMINANT_YEAR)
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", _cents(F.col("l_quantity")).alias("qc"))
    )
    per_pair = shipped.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qc").alias("pair_qty")
    )
    per_part = shipped.groupBy("l_partkey").agg(F.sum("qc").alias("part_qty"))
    dominant = (
        per_pair.join(per_part, "l_partkey")
        .filter(F.col("pair_qty") > DOMINANT_SHARE * F.col("part_qty"))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts_dominated"),
            F.round(F.max(F.col("pair_qty") / F.col("part_qty")), 6).alias(
                "max_share"
            ),
        )
    )
    return dominant.join(
        supp, F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "n_parts_dominated", "max_share")


DOMINANT_SHIPPERS_SQL = f"""
WITH shipped AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(round(l.l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE 'small%'
  WHERE year(l.l_shipdate) = {DOMINANT_YEAR}
), per_pair AS (
  SELECT l_partkey, l_suppkey, sum(qc) AS pair_qty
  FROM shipped GROUP BY 1, 2
), per_part AS (
  SELECT l_partkey, sum(qc) AS part_qty FROM shipped GROUP BY 1
), dominant AS (
  SELECT pp.l_suppkey, count(*) AS n_parts_dominated,
         round(max(pp.pair_qty * 1.0 / pt.part_qty), 6) AS max_share
  FROM per_pair pp
  JOIN per_part pt ON pp.l_partkey = pt.l_partkey
  WHERE pp.pair_qty > {DOMINANT_SHARE} * pt.part_qty
  GROUP BY pp.l_suppkey
)
SELECT s.s_suppkey, s.s_name, d.n_parts_dominated, d.max_share
FROM dominant d JOIN supplier s ON d.l_suppkey = s.s_suppkey
"""


TPCH_FINAL_QUERIES = {
    "forecast_revenue": (forecast_revenue, FORECAST_REVENUE_SQL),
    "market_share": (market_share, MARKET_SHARE_SQL),
    "product_profit": (product_profit, PRODUCT_PROFIT_SQL),
    "shipmode_priority": (shipmode_priority, SHIPMODE_PRIORITY_SQL),
    "supplier_part_counts": (supplier_part_counts, SUPPLIER_PART_COUNTS_SQL),
    "disjunctive_revenue": (disjunctive_revenue, DISJUNCTIVE_REVENUE_SQL),
    "dominant_shippers": (dominant_shippers, DOMINANT_SHIPPERS_SQL),
}
