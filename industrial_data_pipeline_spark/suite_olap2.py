"""OLAP depth, batch 2: the TPC-H shapes the first OLAP suite
(suite_olap.py q49–q58) doesn't reach — nation-pair volume (Q7),
conditional market share (Q8), multi-dim profit (Q9), promo share
(Q14), distinct-supplier counts (Q16), disjunctive-predicate revenue
(Q19), the only-late-supplier triple self-join (Q21), and the
dormant-customer anti-join (Q22) — adapted to the columns the
synthetic tables actually ship (no partsupp/commitdate/receiptdate/
shipmode; cost and lateness are derived deterministically from
retailprice and o_orderdate).

Scale discipline (same as batch 1): dims broadcast, facts shuffle on
their join key only, selective filters applied BEFORE joins so they
push into the parquet scan, money math in DECIMAL so parallel
aggregation is order-independent, ratios divided once in DOUBLE on
both engines, every float rounded to 6dp on both sides.

Reference anchor: beyond-reference OLAP coverage per SURVEY.md §7.1
step 7; the reference's join surface is flat equi-join SQL strings
(/root/reference/database/database.py:394-406).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from industrial_data_pipeline_spark.suite_common import load

_dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
_one = lambda: F.lit(1).cast("decimal(18,2)")  # noqa: E731
# exact line revenue: DECIMAL product, order-independent under sum
_rev = lambda: _dec("l_extendedprice") * (_one() - _dec("l_discount"))  # noqa: E731


# ------------------------------------------------- q73 nation-pair trade
# TPC-H Q7 shape: revenue shipped between two specific nations, both
# directions, by ship year. The nation filter lands on the supplier and
# customer DIMS first (tiny), so the fact is pruned by the broadcast
# hash joins instead of carrying all nations through the shuffle.

def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation") \
        .where(F.col("n_name").isin("NATION_1", "NATION_2")) \
        .select("n_nationkey", "n_name")
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust = (load(spark, sf_dir, "customer")
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem") \
        .where((F.col("l_shipdate") >= F.lit("1996-01-01"))
               & (F.col("l_shipdate") < F.lit("1998-01-01"))) \
        .select("l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


ORACLE_NATION_TRADE_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


# --------------------------------------------------- q74 market share
# TPC-H Q8 shape: one nation's share of a region's market for one part
# type, by order year. Share = conditional-sum / sum — both sums exact
# DECIMAL, ONE double division at the end (decimal-division scales
# differ between engines; IEEE double division doesn't).

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region") \
        .where(F.col("r_name") == "ASIA").select("r_regionkey")
    nation = load(spark, sf_dir, "nation")
    cust = (load(spark, sf_dir, "customer")
            .join(F.broadcast(
                nation.join(F.broadcast(region),
                            nation.n_regionkey == region.r_regionkey)
                .select("n_nationkey")),
                F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey"))
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nation.select("n_nationkey", "n_name")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    part = load(spark, sf_dir, "part") \
        .where(F.col("p_type") == "ECONOMY").select("p_partkey")
    orders = load(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount")
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    return (
        vol.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev())
                   .otherwise(F.lit(0).cast("decimal(18,2)")))
             .cast("double").alias("_nat"),
             F.sum(_rev()).cast("double").alias("_tot"))
        .select("o_year",
                F.round(F.col("_nat") / F.col("_tot"), 6)
                .alias("mkt_share"))
    )


ORACLE_MARKET_SHARE = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       round(
         CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2))
                       - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n2.n_regionkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
GROUP BY 1
"""


# ------------------------------------------------- q75 product profit
# TPC-H Q9 shape (no partsupp → cost is the deterministic proxy
# retailprice·qty/2): profit per supplier nation per ship year. All
# terms exact DECIMAL — (9,2)·(9,2) products stay well inside
# DECIMAL(38) on both engines — summed exactly, one cast to DOUBLE.

def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("nation")))
    part = load(spark, sf_dir, "part") \
        .where(F.col("p_type") == "STANDARD") \
        .select("p_partkey", "p_retailprice")
    li = load(spark, sf_dir, "lineitem") \
        .select("l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
                "l_extendedprice", "l_discount")
    d92 = lambda c: F.col(c).cast("decimal(9,2)")  # noqa: E731
    profit = (_rev()
              - d92("p_retailprice") * d92("l_quantity")
              / F.lit(2).cast("decimal(3,0)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(profit).cast("double"), 6).alias("profit"))
    )


# DECIMAL division by 2 is exact here (inputs have scale ≤4 and the
# result scale on both engines keeps ≥5 fractional digits), so the
# sums agree bit-for-bit before the final cast.
ORACLE_PRODUCT_PROFIT = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       round(CAST(sum(
           CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
           - CAST(p_retailprice AS DECIMAL(9,2))
             * CAST(l_quantity AS DECIMAL(9,2)) / 2
       ) AS DOUBLE), 6) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_type = 'STANDARD'
GROUP BY 1, 2
"""


# ---------------------------------------------- q76 promo revenue share
# TPC-H Q14 shape: promo-type share of one ship-month's revenue.
# Scalar result; the part dim is broadcast, the month filter pushes to
# the fact scan.

def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem") \
        .where((F.col("l_shipdate") >= F.lit("1997-09-01"))
               & (F.col("l_shipdate") < F.lit("1997-10-01"))) \
        .select("l_partkey", "l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.sum(F.when(F.col("p_type") == "PROMO", _rev())
                   .otherwise(F.lit(0).cast("decimal(18,2)")))
             .cast("double").alias("_promo"),
             F.sum(_rev()).cast("double").alias("_tot"))
        .select(F.round(F.lit(100.0) * F.col("_promo") / F.col("_tot"), 6)
                .alias("promo_share"))
    )


ORACLE_PROMO_REVENUE = """
SELECT round(
    100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2))
                  - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
    6) AS promo_share
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


# ------------------------------------------- q77 supplier-part variety
# TPC-H Q16 shape (partsupp stood in by observed lineitem pairs):
# distinct suppliers per (brand, type, size-band). The pair set is
# deduped FIRST — that groupBy is map-side combinable and shrinks the
# fact to part×supplier cardinality before the dim join.

def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = load(spark, sf_dir, "lineitem") \
        .select("l_partkey", "l_suppkey").distinct()
    part = load(spark, sf_dir, "part") \
        .where((F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 25)) \
        .select("p_partkey", "p_brand", "p_type",
                F.floor((F.col("p_size") - 1) / 5).cast("int")
                .alias("size_band"))
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "size_band")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_SUPPLIER_PART_VARIETY = """
SELECT p_brand, p_type,
       CAST((p_size - 1) // 5 AS INTEGER) AS size_band,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size <= 25
GROUP BY 1, 2, 3
"""


# ------------------------------------------ q78 disjunctive revenue
# TPC-H Q19 shape: three OR'd (brand × size × quantity-range) arms.
# The disjunction sits AFTER the partkey equi-join (Catalyst can't
# split it), but each arm's part-side predicate prunes the broadcast
# build side to a few brands.

def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part") \
        .where(F.col("p_brand").isin("Brand#2", "Brand#3", "Brand#4")) \
        .select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem") \
        .where(F.col("l_quantity") <= 30) \
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    arm1 = (b == "Brand#2") & s.between(1, 5) & q.between(1, 11)
    arm2 = (b == "Brand#3") & s.between(1, 10) & q.between(10, 20)
    arm3 = (b == "Brand#4") & s.between(1, 15) & q.between(20, 30)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(arm1 | arm2 | arm3)
        .agg(F.round(F.sum(_rev()).cast("double"), 6).alias("revenue"))
    )


ORACLE_DISJUNCTIVE_REVENUE = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             6) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ------------------------------------------- q79 sole late supplier
# TPC-H Q21 shape ("suppliers who kept orders waiting"; lateness =
# shipped >60 days after the order date, the synthetic stand-in for
# receiptdate>commitdate). Triple self-reference on lineitem — late
# lines, SOME other supplier in the order (semi), NO other supplier
# late (anti) — all three joins share the orderkey shuffle key, so
# the plan co-partitions one shuffle instead of three.

def q_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders") \
        .where(F.col("o_orderstatus") == "F") \
        .select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .where(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .select("l_orderkey", "l_suppkey"))
    l2 = li.select(F.col("l_orderkey").alias("o2"),
                   F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("o3"),
                     F.col("l_suppkey").alias("s3"))
    only_late = (
        late
        .join(l2, (late.l_orderkey == l2.o2)
              & (late.l_suppkey != l2.s2), "left_semi")
        .join(l3, (late.l_orderkey == l3.o3)
              & (late.l_suppkey != l3.s3), "left_anti")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (only_late
            .join(F.broadcast(supp),
                  only_late.l_suppkey == supp.s_suppkey)
            .groupBy("s_name").agg(F.count("*").alias("numwait")))


ORACLE_SOLE_LATE_SUPPLIER = """
WITH late AS (
    SELECT l_orderkey, l_suppkey
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
"""


# ---------------------------------------------- q80 dormant customers
# TPC-H Q22 shape: high-balance customers (above the positive-balance
# mean) with no orders since 2000-01-01. The "recently active" set is
# aggregated to customer cardinality BEFORE the anti-join; the scalar
# mean rides a broadcast cross join, not a re-scan per row.

def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer") \
        .select("c_custkey", "c_nationkey", "c_acctbal")
    mean_pos = cust.where(F.col("c_acctbal") > 0) \
        .agg(F.avg("c_acctbal").alias("_mean"))
    active = load(spark, sf_dir, "orders") \
        .where(F.col("o_orderdate") >= F.lit("2000-01-01")) \
        .select("o_custkey").distinct()
    return (
        cust.crossJoin(F.broadcast(mean_pos))
        .where(F.col("c_acctbal") > F.col("_mean"))
        .join(active, cust.c_custkey == active.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"),
             F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"))
    )


ORACLE_DORMANT_CUSTOMERS = """
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
"""


REGISTRY_OLAP2: dict[str, tuple] = {
    "q73_nation_trade_volume": (q_nation_trade_volume,
                                ORACLE_NATION_TRADE_VOLUME),
    "q74_market_share": (q_market_share, ORACLE_MARKET_SHARE),
    "q75_product_profit": (q_product_profit, ORACLE_PRODUCT_PROFIT),
    "q76_promo_revenue": (q_promo_revenue, ORACLE_PROMO_REVENUE),
    "q77_supplier_part_variety": (q_supplier_part_variety,
                                  ORACLE_SUPPLIER_PART_VARIETY),
    "q78_disjunctive_revenue": (q_disjunctive_revenue,
                                ORACLE_DISJUNCTIVE_REVENUE),
    "q79_sole_late_supplier": (q_sole_late_supplier,
                               ORACLE_SOLE_LATE_SUPPLIER),
    "q80_dormant_customers": (q_dormant_customers,
                              ORACLE_DORMANT_CUSTOMERS),
}
