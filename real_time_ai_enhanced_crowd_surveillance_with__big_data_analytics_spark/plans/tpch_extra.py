"""Further decision-support shapes (TPC-H Q2/Q4/Q11/Q13/Q18/Q21 analogs).

Continues the historical-analysis layer the reference promises
(README.md:2; paper p.3 "historical trend analysis") with the join /
subquery shapes `tpch_advanced.py` doesn't cover:

- Q18: group-HAVING on the fact, joined back to orders + customer
  (large-volume orders).
- Q13: LEFT OUTER join + count distribution (customers by order count),
  keeping the zero-order bucket an inner join would drop.
- Q4: EXISTS → left-semi join with a cross-table predicate riding the
  join condition (order priority check).
- Q2 analog: per-part correlated MIN decorrelated to aggregate + join
  (min-cost supplier; unit cost derives from lineitem because the
  driver schema has no partsupp).
- Q11 analog: HAVING against a scalar subquery computed FROM the
  grouped result itself (nations holding outsized open-order value).
- Q21 analog: semi+anti sandwich collapsed into one windowed pass
  (sole last-shipping supplier on multi-supplier orders).

Cross-engine float parity: every money/quantity SUM goes through exact
integer cents (``CAST(round(x*100) AS BIGINT)``) so the summation order
Spark picks can't flip a low bit vs DuckDB; ratios divide two exact
longs (IEEE division is deterministic) before a final round().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _cents(col) -> F.Column:
    """Exact integer cents of a money/quantity expression."""
    return F.round(col * 100).cast("long")


# --- Q18 shape: large-volume orders ------------------------------------------

QTY_THRESHOLD = 5500  # cents form of 55.0


def large_volume_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Orders whose total quantity exceeds 55, with their customer.

    TPC-H Q18's ``IN (SELECT l_orderkey ... HAVING sum(l_quantity) > θ)``
    re-joins the same relation, so instead of a semi-join against a
    second lineitem scan, aggregate once on l_orderkey and inner-join
    the survivors to orders — one fact shuffle (map-side combined to
    ~|orders| rows). The HAVING keeps only the tail, so AQE converts
    the orders join to a broadcast at runtime.
    """
    li = load_table(spark, "lineitem", sf)
    orders = load_table(spark, "orders", sf)
    cust = load_table(spark, "customer", sf)
    big = (
        li.groupBy("l_orderkey")
        .agg((F.sum(_cents(F.col("l_quantity"))) / 100.0).alias("total_qty"))
        .filter(F.col("total_qty") > QTY_THRESHOLD / 100.0)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


LARGE_VOLUME_ORDERS_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0
         > {QTY_THRESHOLD} / 100.0
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS totalprice,
       b.total_qty
FROM orders o
JOIN big b ON b.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


# --- Q13 shape: customer order-count distribution ----------------------------


def customer_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Histogram of customers by number of non-urgent orders (Q13).

    LEFT OUTER join keeps zero-order customers. Shape: outer join on
    c_custkey → count per customer → re-aggregate on the count. The
    orders-side priority filter belongs in the JOIN condition (not a
    WHERE, which would turn the outer join inner); Spark pushes it to
    the parquet scan of orders anyway because it references only the
    preserved-null side's columns. The second aggregation's key
    cardinality is tiny, so its shuffle is negligible.
    """
    cust = load_table(spark, "customer", sf)
    orders = load_table(spark, "orders", sf).filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


# --- Q4 shape: order priority check (EXISTS) ---------------------------------


def order_priority_check(spark: SparkSession, sf: str) -> DataFrame:
    """Orders from 1996-H1 with at least one line shipped >30 days after
    the order date, counted by priority (Q4; the driver schema has no
    l_commitdate/l_receiptdate, so "late" is ship-vs-order lag).

    EXISTS compiles to a left-semi join. The probe side (orders) is
    date-filtered at the scan; the build side is lineitem pruned to
    (l_orderkey, l_shipdate) — on the 100-TB table only ~16 bytes/row
    cross the shuffle. The lag predicate references both sides, so it
    rides the semi-join condition rather than a pre-filter.
    """
    orders = load_table(spark, "orders", sf).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = load_table(spark, "lineitem", sf).select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORDER_PRIORITY_CHECK_SQL = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority
"""


# --- Q2 analog: min-cost supplier per part -----------------------------------


def min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """For each large part (p_size >= 45), the supplier(s) offering the
    minimum observed unit price (Q2's correlated-MIN; unit cost derives
    from lineitem because the driver schema has no partsupp).

    The correlated ``= (SELECT min(cost) WHERE partkey = outer.partkey)``
    decorrelates into: per-(part,supplier) unit cost → per-part MIN →
    equality join back. The fact is pre-filtered with a broadcast
    semi-join on the qualifying part keys BEFORE the aggregate (the
    p_size filter keeps ~12% of parts — guide-§3.2 shape: drop
    non-matching big-side rows before any exchange), then explicitly
    hash-partitioned on l_partkey ALONE so the (part, supplier)
    aggregate, the per-part min re-aggregation, and the equality join
    back genuinely share ONE exchange (partitioning by (l_partkey,
    l_suppkey) would satisfy none of the downstream clusterings).
    part and supplier broadcast. Unit cost is a ratio of two exact
    cent-sums (deterministic IEEE division) rounded once.
    """
    li = load_table(spark, "lineitem", sf)
    part = load_table(spark, "part", sf).filter(F.col("p_size") >= 45)
    supp = load_table(spark, "supplier", sf)
    li_f = li.join(
        F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_semi",
    )
    cost = (
        li_f.repartition(F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.sum(_cents(F.col("l_extendedprice")))
                / F.sum(_cents(F.col("l_quantity"))),
                6,
            ).alias("unit_cost")
        )
    )
    min_cost = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        cost.join(min_cost, "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal_r"),
            "min_cost",
        )
    )


MIN_COST_SUPPLIER_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               / sum(CAST(round(l_quantity * 100) AS BIGINT)), 6) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
mc AS (
  SELECT l_partkey, min(unit_cost) AS min_cost FROM cost GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
       round(s.s_acctbal, 2) AS s_acctbal_r, mc.min_cost
FROM cost c
JOIN mc ON mc.l_partkey = c.l_partkey AND c.unit_cost = mc.min_cost
JOIN part p ON p.p_partkey = c.l_partkey AND p.p_size >= 45
JOIN supplier s ON s.s_suppkey = c.l_suppkey
"""


# --- Q11 analog: nations holding outsized open-order value -------------------

SHARE_PCT = 4  # percent of global value a nation must exceed


def important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """Supplier nations whose open-order ('O') lineitem value exceeds
    SHARE_PCT% of the global total (Q11's HAVING-vs-scalar-subquery
    shape, over lineitem⋈orders in place of partsupp).

    The global total is the SUM of the per-nation aggregate — computed
    from the 25-row grouped result itself (cached), NOT a second scan
    of the fact. One fact shuffle; the scalar is a 1-row broadcast.
    Values stay in exact integer cents until the final projection, so
    the threshold compare is pure long arithmetic on both engines.
    """
    li = load_table(spark, "lineitem", sf)
    orders = (
        load_table(spark, "orders", sf)
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey")
    )
    supp = load_table(spark, "supplier", sf)
    nation = load_table(spark, "nation", sf)
    per_nation = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("value_cents"))
        .cache()
    )
    # floor() before the cast: DuckDB CAST(double AS BIGINT) rounds while
    # Spark truncates; flooring both sides removes the divergence
    total = per_nation.agg(
        F.floor(F.sum("value_cents") * SHARE_PCT / 100)
        .cast("long")
        .alias("thresh_cents")
    )
    return (
        per_nation.join(F.broadcast(total))
        .filter(F.col("value_cents") > F.col("thresh_cents"))
        .select("n_name", (F.col("value_cents") / 100.0).alias("value"))
    )


IMPORTANT_STOCK_SQL = f"""
WITH per_nation AS (
  SELECT n.n_name,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS value_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE EXISTS (SELECT 1 FROM orders o
                WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'O')
  GROUP BY n.n_name
)
SELECT n_name, value_cents / 100.0 AS value
FROM per_nation
WHERE value_cents > (SELECT CAST(floor(sum(value_cents) * {SHARE_PCT} / 100)
                                 AS BIGINT)
                     FROM per_nation)
"""


# --- Q21 analog: sole last-shipping supplier on multi-supplier orders --------


def late_sole_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Per supplier: count of finished ('F') multi-supplier orders where
    that supplier was the UNIQUE last-to-ship (Q21's shape; with only
    l_shipdate available, "kept the order waiting" = shipped on the
    order's max ship date).

    Textbook Q21 is lineitem ⋈ lineitem (EXISTS) ⋈ lineitem (NOT
    EXISTS) — three fact scans. Here both the semi ("another supplier
    exists") and the anti ("no other supplier shipped last") conditions
    collapse onto ONE window pass over l_orderkey: max ship date and
    distinct-supplier count via window, then a groupBy on the same key
    (no second exchange — the window's hash partitioning is reused) to
    test |last shippers| = 1.
    """
    li = load_table(spark, "lineitem", sf).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, "orders", sf)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, "supplier", sf)
    w = Window.partitionBy("l_orderkey")
    enriched = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supps", F.size(F.collect_set("l_suppkey").over(w)))
    )
    sole = (
        enriched.filter(
            (F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supps") > 1)
        )
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_suppkey").alias("last_supps"))
        .filter(F.size("last_supps") == 1)
        .select(F.element_at("last_supps", 1).alias("s_key"))
    )
    return (
        sole.join(F.broadcast(supp), F.col("s_key") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


LATE_SOLE_SUPPLIER_SQL = """
WITH f AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
  FROM lineitem l
  WHERE EXISTS (SELECT 1 FROM orders o
                WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
),
per_order AS (
  SELECT l_orderkey, max(l_shipdate) AS max_ship,
         count(DISTINCT l_suppkey) AS n_supps
  FROM f GROUP BY l_orderkey
),
last_shippers AS (
  SELECT f.l_orderkey, f.l_suppkey
  FROM f JOIN per_order p
    ON p.l_orderkey = f.l_orderkey AND f.l_shipdate = p.max_ship
  WHERE p.n_supps > 1
  GROUP BY f.l_orderkey, f.l_suppkey
),
sole AS (
  SELECT l_orderkey, min(l_suppkey) AS s_key
  FROM last_shippers GROUP BY l_orderkey HAVING count(*) = 1
)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
FROM sole j JOIN supplier s ON s.s_suppkey = j.s_key
GROUP BY s.s_suppkey, s.s_name
"""


TPCH_EXTRA_QUERIES = {
    "large_volume_orders": (large_volume_orders, LARGE_VOLUME_ORDERS_SQL),
    "customer_order_distribution": (
        customer_order_distribution,
        CUSTOMER_ORDER_DISTRIBUTION_SQL,
    ),
    "order_priority_check": (order_priority_check, ORDER_PRIORITY_CHECK_SQL),
    "min_cost_supplier": (min_cost_supplier, MIN_COST_SUPPLIER_SQL),
    "important_stock": (important_stock, IMPORTANT_STOCK_SQL),
    "late_sole_supplier": (late_sole_supplier, LATE_SOLE_SUPPLIER_SQL),
}
