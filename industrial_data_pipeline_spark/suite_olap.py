"""OLAP / join-depth suite: TPC-H-shaped analytics over the synthetic
star schema (orders ⋈ lineitem facts, region/nation/customer/supplier/
part dims), adapted to the columns TESTDATA.md actually ships.

These queries exist to exercise join shapes the reference-parity suite
(suite.py q01–q18) doesn't reach — left outer joins, EXISTS semi-joins,
multi-way shuffle joins with co-partnered keys, ROLLUP grouping sets,
ranking windows with deterministic top-N — at shapes that scale: dims
are broadcast, fact-fact joins shuffle on the join key, money math runs
in DECIMAL so parallel aggregation is order-independent, and every
float output is rounded to 6dp on both the Spark and oracle sides.

Reference anchor: the reference's relational surface is all equi-joins
built by SQL strings (/root/reference/database/database.py:394-406);
this module is the "beyond-reference" OLAP coverage SURVEY.md §7.1
step 7 calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from industrial_data_pipeline_spark.suite_common import load

# DECIMAL money helper: parallel double-sums differ from a serial oracle
# in the last ulps; DECIMAL(18,2) inputs make the sum exact on both
# engines, cast to DOUBLE once at the end.
_dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
# F.lit needs an active SparkContext — must stay lazy (module import
# happens before the test session exists).
_one = lambda: F.lit(1).cast("decimal(18,2)")  # noqa: E731


# ------------------------------------------------- q49 shipping priority
# TPC-H Q3 shape: segment filter on the customer dim (broadcast), date
# filters pushed to both fact scans, shuffle join orders⋈lineitem on
# orderkey, top-10 by revenue with a deterministic orderkey tiebreak.

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer") \
        .where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = load(spark, sf_dir, "orders") \
        .where(F.col("o_orderdate") < F.lit("1996-03-15")) \
        .select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem") \
        .where(F.col("l_shipdate") > F.lit("1996-03-15")) \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
             .cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


ORACLE_SHIPPING_PRIORITY = """
SELECT o_orderkey, o_orderdate,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------- q50 local supplier volume
# TPC-H Q5 shape: 6-way join; region/nation/supplier/customer broadcast,
# the customer-nation == supplier-nation equality closes the snowflake.

def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region") \
        .where(F.col("r_name") == "ASIA").select("r_regionkey")
    nation = load(spark, sf_dir, "nation") \
        .select("n_nationkey", "n_name", "n_regionkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders") \
        .where((F.col("o_orderdate") >= F.lit("1996-01-01"))
               & (F.col("o_orderdate") < F.lit("1997-01-01"))) \
        .select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
             .cast("double").alias("revenue"))
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# ------------------------------------------------ q51 order priority cnt
# TPC-H Q4 shape (adapted: no commit/receipt dates in the synthetic
# lineitem — the EXISTS predicate is "some line shipped after the order
# date"): EXISTS → left-semi join on the fact, then a tiny aggregate.

def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders") \
        .where((F.col("o_orderdate") >= F.lit("1996-07-01"))
               & (F.col("o_orderdate") < F.lit("1996-10-01"))) \
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li, (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate), "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


ORACLE_ORDER_PRIORITY_COUNT = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# --------------------------------------------------- q52 returned items
# TPC-H Q10 shape: returnflag filter on the fact, revenue per customer,
# top-20 with custkey tiebreak. customer/nation broadcast.

def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer") \
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders") \
        .where((F.col("o_orderdate") >= F.lit("1996-10-01"))
               & (F.col("o_orderdate") < F.lit("1997-01-01"))) \
        .select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem") \
        .where(F.col("l_returnflag") == "R") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
             .cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_RETURNED_ITEMS = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ------------------------------------------- q53 customer order distrib
# TPC-H Q13 shape: LEFT OUTER join (the only outer join in the suite) +
# two-level aggregation — customers with zero orders must survive.

def q_customer_order_distribution(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders") \
        .where(F.col("o_orderpriority") != "1-URGENT") \
        .select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


ORACLE_CUSTOMER_ORDER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
"""


# ------------------------------------------- q54 small-quantity revenue
# TPC-H Q17 shape: per-part average quantity as a correlated aggregate —
# expressed as a self-aggregation join (shuffle on partkey both sides,
# no correlated-subquery re-scan per row).

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part") \
        .where(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = load(spark, sf_dir, "lineitem") \
        .select("l_partkey", "l_quantity", "l_extendedprice")
    per_part_avg = (li.groupBy("l_partkey")
                    .agg(F.avg("l_quantity").alias("avg_qty"))
                    .withColumnRenamed("l_partkey", "a_partkey"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == per_part_avg.a_partkey)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
             .alias("avg_yearly"))
        .select(F.round("avg_yearly", 6).alias("avg_yearly"))
    )


# the sum is exact DECIMAL on both engines; divide AFTER the cast to
# DOUBLE so both sides do the same IEEE division (decimal-division
# result scales differ between Spark and DuckDB).
ORACLE_SMALL_QUANTITY_REVENUE = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < 0.2 * (SELECT avg(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = lineitem.l_partkey)
"""


# ------------------------------------------- q55 large volume customers
# TPC-H Q18 shape: HAVING on a fact aggregate → semi-join back to the
# orders/customer side.

def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 150))
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", F.col("sum_qty").alias("total_qty"))
    )


ORACLE_LARGE_VOLUME_CUSTOMERS = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum_qty AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150) b ON o_orderkey = b.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ------------------------------------------------ q56 rollup aggregates
# ROLLUP grouping sets (beyond-reference; Spark `rollup` ≡ DuckDB
# GROUP BY ROLLUP). count + exact-decimal qty sum per (flag, status),
# per flag, and grand total.

def q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"),
                 F.sum(_dec("l_quantity")).cast("double").alias("sum_qty")))


ORACLE_PRICING_ROLLUP = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ----------------------------------------------- q57 order rank window
# Ranking window (beyond-reference): rank a customer's orders by price,
# deterministic via the orderkey tiebreak; keep each customer's top 3.

def q_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders") \
        .select("o_custkey", "o_orderkey", "o_totalprice")
    w = Window.partitionBy("o_custkey") \
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (orders.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rk"))


ORACLE_ORDER_RANK = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC)
                 AS rk
      FROM orders)
WHERE rk <= 3
"""


# ------------------------------------------- q58 cumulative user value
# Running-total window over the event stream (beyond-reference): per
# user, cumulative value ordered by (ts, event_id). The running sum is
# order-DEPENDENT, so the frame must be deterministic: event_id breaks
# ts ties, and ROWS UNBOUNDED PRECEDING pins the frame on both engines.

def q_cumulative_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events") \
        .select("user_id", "event_id", "ts", "value")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ev.withColumn(
        "cum_value", F.round(F.sum(_dec("value")).over(w)
                             .cast("double"), 6))
        .select("user_id", "event_id", "ts", "cum_value"))


ORACLE_CUMULATIVE_USER_VALUE = """
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       round(CAST(sum(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE), 6) AS cum_value
FROM events
"""


REGISTRY_OLAP: dict[str, tuple] = {
    "q49_shipping_priority": (q_shipping_priority, ORACLE_SHIPPING_PRIORITY),
    "q50_local_supplier_volume": (q_local_supplier_volume,
                                  ORACLE_LOCAL_SUPPLIER_VOLUME),
    "q51_order_priority_count": (q_order_priority_count,
                                 ORACLE_ORDER_PRIORITY_COUNT),
    "q52_returned_items": (q_returned_items, ORACLE_RETURNED_ITEMS),
    "q53_customer_order_distribution": (
        q_customer_order_distribution, ORACLE_CUSTOMER_ORDER_DISTRIBUTION),
    "q54_small_quantity_revenue": (q_small_quantity_revenue,
                                   ORACLE_SMALL_QUANTITY_REVENUE),
    "q55_large_volume_customers": (q_large_volume_customers,
                                   ORACLE_LARGE_VOLUME_CUSTOMERS),
    "q56_pricing_rollup": (q_pricing_rollup, ORACLE_PRICING_ROLLUP),
    "q57_order_rank": (q_order_rank, ORACLE_ORDER_RANK),
    "q58_cumulative_user_value": (q_cumulative_user_value,
                                  ORACLE_CUMULATIVE_USER_VALUE),
}
