"""Correlated-subquery / decision-support shapes (TPC-H Q7/Q14/Q15/Q17/Q22).

The reference promises "historical trend analysis for predictive
modeling" (README.md:2; paper p.3 Functional Requirements) but persists
nothing — these queries are that layer, exercised on the driver's
TPC-H-ish tables. Each shape stresses a planner capability the simpler
queries don't:

- Q17: correlated scalar aggregate (per-part avg) — decorrelated into
  an aggregate + join; the per-part aggregate is map-side combinable.
- Q7: multi-fact join (lineitem ⋈ orders) with two independent
  dimension chains (supplier→nation, customer→nation) — broadcast the
  dims, sort-merge/shuffle-hash the fact-fact edge; AQE picks at runtime.
- Q15: scalar MAX subquery over an aggregate (argmax supplier) —
  1-row broadcast cross join, not a single-partition window.
- Q22: scalar AVG subquery + anti-join (customers with money and no
  orders).
- Q14: conditional-aggregate ratio (promo revenue share).

Floats are rounded before any equality/threshold comparison so the
Spark and DuckDB sides agree bit-for-bit (see
memory: round(6) suffices for cross-engine float parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QTY_FACTOR = 0.5  # TPC-H Q17 uses 0.2; synthetic quantities are uniform,
                  # 0.5 keeps a non-trivial surviving fraction per part

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- Q17 shape: small-quantity revenue (correlated scalar avg) ---------------

def small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Per-brand revenue from lineitems whose quantity is below half the
    part's average quantity.

    The correlated subquery ``(SELECT avg(l_quantity) WHERE l_partkey =
    outer.l_partkey)`` decorrelates to a per-part aggregate joined back
    on l_partkey — both sides of that join are partitioned on the same
    key, and the aggregate is partial/map-side combinable, so the shape
    is one shuffle on l_partkey plus a broadcast of ``part`` (a
    dimension; at 100 TB part is still ~1e9× smaller than lineitem).
    """
    li = load_table(spark, "lineitem", sf)
    part = load_table(spark, "part", sf)
    per_part = li.groupBy("l_partkey").agg(
        F.round(F.avg("l_quantity") * QTY_FACTOR, 6).alias("qty_cap")
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, round(avg(l_quantity) * {QTY_FACTOR}, 6) AS qty_cap
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_items
FROM lineitem l
JOIN per_part pp ON pp.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < pp.qty_cap
GROUP BY p.p_brand
"""


# --- Q7 shape: volume shipping between nation pairs --------------------------

def volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue shipped between each (supplier nation, customer nation)
    pair by year, for 1996-1997 shipments, excluding domestic pairs.

    Two independent dimension chains hang off the lineitem⋈orders
    fact-fact join: supplier→nation and orders→customer→nation. The
    dims are broadcast; the fact-fact edge shuffles on the order key
    (or SMJ under AQE). The shipdate filter is pushed to the parquet
    scan; year() is computed post-join on the surviving rows only.
    """
    li = load_table(spark, "lineitem", sf).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, "orders", sf)
    cust = load_table(spark, "customer", sf)
    supp = load_table(spark, "supplier", sf)
    nation = load_table(spark, "nation", sf)
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        # sum in exact integer cents: double summation order differs
        # between engines and flips the last cent on large groups
        .agg(
            (
                F.sum(F.round(_rev() * 100).cast("long")) / F.lit(100.0)
            ).alias("revenue")
        )
    )


VOLUME_SHIPPING_SQL = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
         / 100.0 AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
"""


# --- Q15 shape: top supplier (scalar MAX over an aggregate) ------------------

def top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Supplier(s) whose Q1-1996 revenue equals the maximum.

    The ``WHERE total = (SELECT max(total) ...)`` scalar subquery is a
    1-row aggregate broadcast-cross-joined against the per-supplier
    totals — no single-partition window, no second scan of lineitem
    (the totals subtree is computed once and reused via cache()).
    Totals are rounded to 2 decimals before the equality compare so
    both engines pick the same argmax set.
    """
    li = load_table(spark, "lineitem", sf).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = load_table(spark, "supplier", sf)
    totals = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
        .cache()
    )
    max_rev = totals.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        totals.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


TOP_SUPPLIER_SQL = """
WITH totals AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, t.total_revenue
FROM totals t
JOIN supplier s ON s.s_suppkey = t.l_suppkey
WHERE t.total_revenue = (SELECT max(total_revenue) FROM totals)
"""


# --- Q22 shape: high-balance customers with no orders ------------------------

RECENT_CUTOFF = "2000-01-01"


def high_balance_no_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Per market segment: customers whose balance exceeds the average
    positive balance and who have placed no orders since RECENT_CUTOFF
    (lapsed high-value customers — TPC-H Q22's shape).

    Scalar AVG subquery → 1-row broadcast; "no recent orders" → left
    anti-join on o_custkey (the Spark form of NOT EXISTS). The
    anti-join build side is date-filtered at the scan (parquet
    pushdown) and pruned to the single o_custkey column, so the
    shuffled payload is minimal.
    """
    cust = load_table(spark, "customer", sf)
    orders = load_table(spark, "orders", sf)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit(RECENT_CUTOFF)).select(
        "o_custkey"
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


HIGH_BALANCE_NO_ORDERS_SQL = f"""
SELECT c_mktsegment,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer
                   WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{RECENT_CUTOFF} 00:00:00')
GROUP BY c_mktsegment
"""


# --- Q14 shape: promo revenue share (conditional-aggregate ratio) ------------

def promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Share of 1996 revenue from PROMO-type parts — a conditional
    aggregate ratio computed in one pass (two sums over the same
    filtered scan; no self-join)."""
    li = load_table(spark, "lineitem", sf).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part = load_table(spark, "part", sf)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0))
                / F.sum(_rev()),
                6,
            ).alias("promo_revenue_pct")
        )
    )


PROMO_REVENUE_SQL = """
SELECT round(
         100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0.0 END)
         / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
"""


TPCH_ADVANCED_QUERIES = {
    "small_quantity_revenue": (small_quantity_revenue, SMALL_QUANTITY_REVENUE_SQL),
    "volume_shipping": (volume_shipping, VOLUME_SHIPPING_SQL),
    "top_supplier": (top_supplier, TOP_SUPPLIER_SQL),
    "high_balance_no_orders": (high_balance_no_orders, HIGH_BALANCE_NO_ORDERS_SQL),
    "promo_revenue": (promo_revenue, PROMO_REVENUE_SQL),
}
