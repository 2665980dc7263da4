"""Data-engineering suite (q101–q104): the warehouse-maintenance
shapes every pipeline team runs beside analytics — SCD Type 2
interval building, whole-table profiling via unpivot, referential-
integrity auditing, and NTILE decile summaries.

Scale shapes: SCD2 is one window over the natural (entity, ts) sort;
the profile unpivots COLUMNS (constant factor) not rows; the FK audit
is four anti-join counts that each aggregate the fact side to its key
set first; deciles are one window + one combinable groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from industrial_data_pipeline_spark.suite_common import load

_EV = """
ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
              event_type, value FROM events)
"""


# --------------------------------------------- q101 SCD Type 2 build

def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 from an event log: one validity interval per
    (user, consecutive run of equal event_type) — the classic
    change-capture reshape. Runs are found with the two-window
    gaps-and-islands trick (lag → change flag → running sum), then one
    aggregation per island; valid_to is NULL on the open interval."""
    ev = load(spark, sf_dir, "events") \
        .select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (ev.withColumn(
        "_chg", F.when(F.lag("event_type").over(w).isNull()
                       | (F.lag("event_type").over(w)
                          != F.col("event_type")), 1).otherwise(0))
        .withColumn("_run", F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    isl = (run.groupBy("user_id", "_run")
           .agg(F.first("event_type").alias("state"),
                F.min("ts").alias("valid_from"),
                F.count("*").alias("n_events")))
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return (isl.withColumn("valid_to", F.lead("valid_from").over(w2))
            .select("user_id", "state", "valid_from", "valid_to",
                    "n_events"))


ORACLE_SCD2 = f"""
WITH {_EV},
r AS (SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
i AS (SELECT user_id, event_type AS state,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS run,
             ts
      FROM r),
g AS (SELECT user_id, run, min(state) AS state,
             min(ts) AS valid_from, count(*) AS n_events
      FROM i GROUP BY 1, 2)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from) AS valid_to,
       n_events
FROM g
"""


# ------------------------------------------------ q102 table profile

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile of the orders table via UNPIVOT (stack): per
    numeric column — row/null/distinct counts, min/max. One pass,
    column count is the only fan-out factor."""
    orders = load(spark, sf_dir, "orders")
    stack_expr = "stack({n}, {args}) as (col_name, v)".format(
        n=len(_PROFILE_COLS),
        args=", ".join(f"'{c}', cast({c} as double)"
                       for c in _PROFILE_COLS))
    return (orders.selectExpr(stack_expr)
            .groupBy("col_name")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("v").isNull().cast("long")).alias("n_null"),
                 F.countDistinct("v").alias("n_distinct"),
                 F.round(F.min("v"), 6).alias("min_v"),
                 F.round(F.max("v"), 6).alias("max_v")))


ORACLE_TABLE_PROFILE = """
SELECT col_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
       count(DISTINCT v) AS n_distinct,
       round(min(v), 6) AS min_v, round(max(v), 6) AS max_v
FROM (SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS DOUBLE) AS v
      FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(o_custkey AS DOUBLE) FROM orders
      UNION ALL
      SELECT 'o_totalprice', CAST(o_totalprice AS DOUBLE) FROM orders)
GROUP BY 1
"""


# -------------------------------------------------- q103 FK audit

def q_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for four FK edges.
    Each check aggregates the child side to its distinct key set
    first (combinable, key-cardinality bounded), then one anti-join
    against the parent keys; the four tiny results union."""
    def orphans(child: DataFrame, ckey: str, parent: DataFrame,
                pkey: str, name: str) -> DataFrame:
        ck = child.select(F.col(ckey).alias("k")).distinct()
        pk = parent.select(F.col(pkey).alias("k"))
        return (ck.join(pk, "k", "left_anti")
                .agg(F.lit(name).alias("fk_edge"),
                     F.count("*").alias("orphan_keys")))

    li = load(spark, sf_dir, "lineitem")
    return (
        orphans(li, "l_orderkey", load(spark, sf_dir, "orders"),
                "o_orderkey", "lineitem.orderkey->orders")
        .unionAll(orphans(li, "l_partkey", load(spark, sf_dir, "part"),
                          "p_partkey", "lineitem.partkey->part"))
        .unionAll(orphans(li, "l_suppkey",
                          load(spark, sf_dir, "supplier"),
                          "s_suppkey", "lineitem.suppkey->supplier"))
        .unionAll(orphans(load(spark, sf_dir, "orders"), "o_custkey",
                          load(spark, sf_dir, "customer"),
                          "c_custkey", "orders.custkey->customer")))


ORACLE_FK_AUDIT = """
SELECT 'lineitem.orderkey->orders' AS fk_edge,
       count(*) AS orphan_keys
FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem)
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = k)
UNION ALL
SELECT 'lineitem.partkey->part', count(*)
FROM (SELECT DISTINCT l_partkey AS k FROM lineitem)
WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = k)
UNION ALL
SELECT 'lineitem.suppkey->supplier', count(*)
FROM (SELECT DISTINCT l_suppkey AS k FROM lineitem)
WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = k)
UNION ALL
SELECT 'orders.custkey->customer', count(*)
FROM (SELECT DISTINCT o_custkey AS k FROM orders)
WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = k)
"""


# ---------------------------------------------- q104 price deciles

def q_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(10) deciles of order price per priority class: decile
    bounds and counts — the distribution summary behind quantile
    reports. ntile + one combinable groupBy; ties broken by orderkey
    so both engines bucket identically."""
    orders = load(spark, sf_dir, "orders") \
        .select("o_orderpriority", "o_totalprice", "o_orderkey")
    w = Window.partitionBy("o_orderpriority") \
        .orderBy("o_totalprice", "o_orderkey")
    return (orders.withColumn("decile", F.ntile(10).over(w))
            .groupBy("o_orderpriority", "decile")
            .agg(F.count("*").alias("n"),
                 F.round(F.min("o_totalprice"), 6).alias("lo"),
                 F.round(F.max("o_totalprice"), 6).alias("hi")))


ORACLE_PRICE_DECILES = """
SELECT o_orderpriority, decile, count(*) AS n,
       round(min(o_totalprice), 6) AS lo,
       round(max(o_totalprice), 6) AS hi
FROM (SELECT o_orderpriority, o_totalprice,
             ntile(10) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey)
                 AS decile
      FROM orders)
GROUP BY 1, 2
"""


REGISTRY_DATAENG: dict[str, tuple] = {
    "q101_scd2_user_state": (q_scd2_user_state, ORACLE_SCD2),
    "q102_table_profile": (q_table_profile, ORACLE_TABLE_PROFILE),
    "q103_fk_audit": (q_fk_audit, ORACLE_FK_AUDIT),
    "q104_price_deciles": (q_price_deciles, ORACLE_PRICE_DECILES),
}


# ------------------------------------------------ q162 snapshot diff

def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two deterministic customer-dim snapshots: v1 =
    custkey < 900, v2 = custkey >= 100 with every 13th segment
    relabeled and every 7th balance shifted — so the diff contains
    all four verdicts (added / removed / changed / unchanged) and
    per-row changed-column lists (operators/diff.py::table_diff, one
    full outer join + null-safe compares)."""
    from industrial_data_pipeline_spark.operators.diff import table_diff
    cust = load(spark, sf_dir, "customer")
    v1 = (cust.where(F.col("c_custkey") < 900)
          .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"))
    v2 = (cust.where(F.col("c_custkey") >= 100)
          .select("c_custkey", "c_name",
                  F.when(F.col("c_custkey") % 13 == 0, F.lit("SHIFTED"))
                  .otherwise(F.col("c_mktsegment"))
                  .alias("c_mktsegment"),
                  F.when(F.col("c_custkey") % 7 == 0,
                         F.col("c_acctbal") + F.lit(10.0))
                  .otherwise(F.col("c_acctbal")).alias("c_acctbal")))
    return table_diff(v1, v2, ["c_custkey"],
                      ["c_name", "c_mktsegment", "c_acctbal"])


ORACLE_TABLE_DIFF = """
WITH o AS (SELECT c_custkey, c_name, c_mktsegment, c_acctbal
           FROM customer WHERE c_custkey < 900),
n AS (SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 13 = 0 THEN 'SHIFTED'
                  ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey >= 100),
j AS (SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
             o.c_custkey IS NOT NULL AS in_o,
             n.c_custkey IS NOT NULL AS in_n,
             o.c_name IS NOT DISTINCT FROM n.c_name AS eq_name,
             o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment
                 AS eq_seg,
             o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal AS eq_bal
      FROM o FULL JOIN n ON o.c_custkey = n.c_custkey)
SELECT c_custkey,
       CASE WHEN NOT in_o THEN 'added'
            WHEN NOT in_n THEN 'removed'
            WHEN eq_name AND eq_seg AND eq_bal THEN 'unchanged'
            ELSE 'changed' END AS change_type,
       CASE WHEN in_o AND in_n AND NOT (eq_name AND eq_seg AND eq_bal)
            THEN concat_ws(',',
                 CASE WHEN NOT eq_name THEN 'c_name' END,
                 CASE WHEN NOT eq_seg THEN 'c_mktsegment' END,
                 CASE WHEN NOT eq_bal THEN 'c_acctbal' END)
            ELSE '' END AS changed_cols
FROM j
"""

REGISTRY_DATAENG.update({
    "q162_table_diff": (q_table_diff, ORACLE_TABLE_DIFF),
})


# --------------------------------------- q203 Benford digit audit

def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit (Benford's law) audit of order totals — the
    classic synthetic-/fabricated-data smoke test a warehouse runs on
    every monetary column. Per leading digit: count, observed share,
    and the Benford expectation log10(1+1/d). The digit comes from
    floor→BIGINT→string so both engines take the same integer path
    (double→string formatting differs between engines); shares are
    one int/int double division, identical everywhere. Scale shape:
    one combinable 9-group aggregation; the total rides along as
    sum(n) over a broadcast 9-row join, never a second scan."""
    d = (load(spark, sf_dir, "orders")
         .select(F.substring(F.floor("o_totalprice").cast("bigint")
                             .cast("string"), 1, 1).cast("int")
                 .alias("digit"))
         .groupBy("digit").agg(F.count("*").alias("n")))
    tot = d.agg(F.sum("n").alias("_tot"))
    return (d.crossJoin(F.broadcast(tot))
            .select("digit", "n",
                    (F.round(F.col("n") / F.col("_tot"), 6) + 0.0)
                    .alias("observed"),
                    (F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6)
                     + 0.0).alias("benford")))


ORACLE_BENFORD = """
WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit,
                  count(*) AS n
           FROM orders GROUP BY 1),
t AS (SELECT sum(n) AS tot FROM d)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / tot, 6) + 0.0 AS observed,
       round(log10(1.0 + 1.0 / digit), 6) + 0.0 AS benford
FROM d, t
"""


# ------------------------------------ q206 bitemporal point-in-time

_BT_VALID = "2024-01-20 00:00:00"
_BT_TX = "2024-01-21 12:00:00"


def q_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal point-in-time lookup: each user's latest state
    along VALID time (when the reading happened) as KNOWN at a past
    TRANSACTION time (when the warehouse learned it). Arrival lag is
    derived deterministically (event_id % 3 hours), so some readings
    valid before the cutoff were not yet known at the tx cutoff and
    the answer must fall back to the previous version — the audit
    semantics ('what did we believe on the 21st?') that a plain as-of
    join cannot answer. One window over (user, valid ts); both
    filters prune before the shuffle."""
    ev = (load(spark, sf_dir, "events")
          .select("user_id", "event_id", "ts", "event_type", "value",
                  (F.col("ts") + F.make_interval(
                      hours=F.col("event_id") % 3)).alias("tx_ts")))
    vis = ev.where((F.col("ts") <= _BT_VALID)
                   & (F.col("tx_ts") <= _BT_TX))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id"))
    return (vis.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("user_id", F.col("ts").alias("valid_ts"),
                    "tx_ts", "event_type", "value"))


ORACLE_BITEMPORAL = f"""
WITH {_EV},
b AS (SELECT user_id, event_id, ts, event_type, value,
             ts + to_hours(event_id % 3) AS tx_ts
      FROM ev),
v AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC)
             AS rn
      FROM b
      WHERE ts <= TIMESTAMP '{_BT_VALID}'
        AND tx_ts <= TIMESTAMP '{_BT_TX}')
SELECT user_id, ts AS valid_ts, tx_ts, event_type, value
FROM v WHERE rn = 1
"""

REGISTRY_DATAENG.update({
    "q203_benford_audit": (q_benford_audit, ORACLE_BENFORD),
    "q206_bitemporal_asof": (q_bitemporal_asof, ORACLE_BITEMPORAL),
})


# ------------------- q215 SCD2 transition attribution (temporal)

def q_scd2_prior_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which SCD2 state did each user leave to make a purchase?  For
    every purchase, the most recent DIFFERENT event_type before it
    (conditional last_value over the running frame) — the
    from-state of the conversion transition, aggregated to a
    (prior_state → n, users, value) table. One window pass per user,
    DECIMAL-exact sums; NULL prior state (purchase-first users)
    groups as 'none'."""
    ev = load(spark, sf_dir, "events") \
        .select("user_id", "event_id", "ts", "event_type", "value")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.last(F.when(F.col("event_type") != "purchase",
                          F.col("event_type")), ignorenulls=True).over(w)
    return (ev.withColumn("_prior", prior)
            .where(F.col("event_type") == "purchase")
            .groupBy(F.coalesce("_prior", F.lit("none"))
                     .alias("prior_state"))
            .agg(F.count("*").alias("n_purchases"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum(F.col("value").cast("decimal(28,6)"))
                 .cast("double").alias("sum_value")))


ORACLE_SCD2_PRIOR_STATE = f"""
WITH {_EV},
p AS (SELECT user_id, event_type, value,
             last(CASE WHEN event_type <> 'purchase'
                       THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prior_state
      FROM ev)
SELECT coalesce(prior_state, 'none') AS prior_state,
       count(*) AS n_purchases,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM p WHERE event_type = 'purchase'
GROUP BY 1
"""

REGISTRY_DATAENG.update({
    "q215_scd2_prior_state": (q_scd2_prior_state,
                              ORACLE_SCD2_PRIOR_STATE),
})


# --------------------------- q216 data-quality expectation suite

def q_dq_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expectations scorecard a pipeline gate runs before
    publishing a table: one row per declared constraint with rows
    checked, violations, and pass/fail — completeness (NOT NULL),
    validity (range / set membership), uniqueness (key), and
    referential integrity (orphan FK), over orders+lineitem. Every
    check is a combinable aggregation or an anti-join count; the
    whole card is a union of tiny results, so it costs one scan per
    table plus one key-project join."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def card(name, total_col, viol_col, df):
        return df.agg(F.lit(name).alias("expectation"),
                      F.count(total_col).alias("n_checked"),
                      F.count(F.when(viol_col, 1)).alias("n_violations"),
                      (F.count(F.when(viol_col, 1)) == 0).alias("ok"))

    c1 = card("orders.o_totalprice NOT NULL AND > 0", "*",
              F.col("o_totalprice").isNull()
              | (F.col("o_totalprice") <= 0), orders)
    c2 = card("orders.o_orderpriority IN 5 known values", "*",
              ~F.col("o_orderpriority").isin(
                  "1-URGENT", "2-HIGH", "3-MEDIUM",
                  "4-NOT SPECIFIED", "5-LOW"), orders)
    c3 = card("lineitem.l_discount IN [0, 0.1]", "*",
              (F.col("l_discount") < 0)
              | (F.col("l_discount") > 0.1), li)
    dup = (orders.groupBy("o_orderkey")
           .agg(F.count("*").alias("_c"))
           .agg(F.lit("orders.o_orderkey UNIQUE").alias("expectation"),
                F.count("*").alias("n_checked"),
                F.count(F.when(F.col("_c") > 1, 1))
                .alias("n_violations"),
                (F.count(F.when(F.col("_c") > 1, 1)) == 0).alias("ok")))
    orphan = (li.select(F.col("l_orderkey").alias("k")).distinct()
              .join(orders.select(F.col("o_orderkey").alias("k")),
                    "k", "left_anti")
              .agg(F.lit("lineitem.l_orderkey REFERENCES orders")
                   .alias("expectation"),
                   F.count("*").alias("n_checked"),
                   F.count("*").alias("n_violations"),
                   (F.count("*") == 0).alias("ok")))
    return c1.unionByName(c2).unionByName(c3).unionByName(dup) \
        .unionByName(orphan)


ORACLE_DQ_SCORECARD = """
SELECT 'orders.o_totalprice NOT NULL AND > 0' AS expectation,
       count(*) AS n_checked,
       count(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                  THEN 1 END) AS n_violations,
       count(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                  THEN 1 END) = 0 AS ok
FROM orders
UNION ALL
SELECT 'orders.o_orderpriority IN 5 known values', count(*),
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
             '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW') THEN 1 END),
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
             '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW') THEN 1 END) = 0
FROM orders
UNION ALL
SELECT 'lineitem.l_discount IN [0, 0.1]', count(*),
       count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END),
       count(CASE WHEN l_discount < 0 OR l_discount > 0.1
                  THEN 1 END) = 0
FROM lineitem
UNION ALL
SELECT 'orders.o_orderkey UNIQUE', count(*),
       count(CASE WHEN c > 1 THEN 1 END),
       count(CASE WHEN c > 1 THEN 1 END) = 0
FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
UNION ALL
SELECT 'lineitem.l_orderkey REFERENCES orders', count(*), count(*),
       count(*) = 0
FROM (SELECT DISTINCT l_orderkey FROM lineitem
      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
"""

REGISTRY_DATAENG.update({
    "q216_dq_scorecard": (q_dq_scorecard, ORACLE_DQ_SCORECARD),
})


# ---------------------- q232 CDC changelog APPLY (merge semantics)

def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE half of CDC (q162 computes a diff; this replays
    one): a deterministic changelog — inserts (orderkey % 977 == 0,
    withheld from the snapshot), updates (% 13 == 0: status → 'X',
    price + $1) and deletes (% 31 == 0) — MERGEs into the orders
    snapshot via operators/diff.py::apply_changelog (one anti-join +
    one union, no window). Prices ride as integer CENTS so every
    value is engine-exact. Emits per-status row counts, an exact
    total, and an order-independent bit_xor content checksum of the
    final state (q186's primitive) — the oracle replays the merged
    TABLE, not just its size."""
    from industrial_data_pipeline_spark.operators.diff import (
        apply_changelog)
    from industrial_data_pipeline_spark.operators.text import hash64

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint")
        .alias("price_cents"))
    snap = o.where(F.col("o_orderkey") % 977 != 0)
    ins = (o.where(F.col("o_orderkey") % 977 == 0)
           .withColumn("op", F.lit("I")))
    upd = (o.where((F.col("o_orderkey") % 977 != 0)
                   & (F.col("o_orderkey") % 13 == 0))
           .withColumn("o_orderstatus", F.lit("X"))
           .withColumn("price_cents", F.col("price_cents") + 100)
           .withColumn("op", F.lit("U")))
    dels = (o.where((F.col("o_orderkey") % 977 != 0)
                    & (F.col("o_orderkey") % 13 != 0)
                    & (F.col("o_orderkey") % 31 == 0))
            .withColumn("op", F.lit("D")))
    final = apply_changelog(
        snap, ins.unionByName(upd).unionByName(dels), ["o_orderkey"])
    rendered = F.concat_ws("|", F.col("o_orderkey").cast("string"),
                           F.col("o_custkey").cast("string"),
                           F.col("o_orderstatus"),
                           F.col("price_cents").cast("string"))
    return (final.select("o_orderstatus",
                         "price_cents",
                         hash64(rendered).alias("h"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("price_cents").alias("total_cents"),
                 F.expr("bit_xor(h)").alias("checksum")))


ORACLE_CDC_APPLY = """
WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                  CAST(round(o_totalprice * 100) AS BIGINT)
                      AS price_cents
           FROM orders),
snap AS (SELECT * FROM o WHERE o_orderkey % 977 <> 0),
ins AS (SELECT o_orderkey, o_custkey, o_orderstatus, price_cents
        FROM o WHERE o_orderkey % 977 = 0),
upd AS (SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
               price_cents + 100 AS price_cents
        FROM o WHERE o_orderkey % 977 <> 0 AND o_orderkey % 13 = 0),
dels AS (SELECT o_orderkey FROM o
         WHERE o_orderkey % 977 <> 0 AND o_orderkey % 13 <> 0
           AND o_orderkey % 31 = 0),
touched AS (SELECT o_orderkey FROM ins
            UNION SELECT o_orderkey FROM upd
            UNION SELECT o_orderkey FROM dels),
final AS (SELECT * FROM snap
          WHERE o_orderkey NOT IN (SELECT o_orderkey FROM touched)
          UNION ALL SELECT * FROM ins
          UNION ALL SELECT * FROM upd),
h AS (SELECT o_orderstatus, price_cents,
             (('0x' || substr(md5(
                 CAST(o_orderkey AS VARCHAR) || '|'
                 || CAST(o_custkey AS VARCHAR) || '|'
                 || o_orderstatus || '|'
                 || CAST(price_cents AS VARCHAR)), 1, 15))::BIGINT)
                 AS h
      FROM final)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price_cents) AS BIGINT) AS total_cents,
       bit_xor(h) AS checksum
FROM h GROUP BY 1
"""

REGISTRY_DATAENG.update({
    "q232_cdc_apply": (q_cdc_apply, ORACLE_CDC_APPLY),
})


# ------------------------------- q234 k-anonymity / l-diversity audit

_KANON_K, _KANON_L = 12, 10


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-gate privacy audit of the ``customer`` dimension:
    k-anonymity / l-diversity per (c_mktsegment, c_nationkey)
    equivalence class with c_acctbal as the sensitive attribute
    (operators/privacy.py::k_anonymity_audit; Sweeney 2002 /
    Machanavajjhala 2007). The reference exports raw site- and
    user-keyed telemetry with no such gate (web_app.py export
    endpoints); at training-data scale every outbound table needs
    one. One map-side-combined groupBy over the quasi key plus a
    broadcast 1-row total — output is bounded by the quasi-identifier
    domain (5 segments x 25 nations), independent of row count."""
    from industrial_data_pipeline_spark.operators.privacy import (
        k_anonymity_audit)
    cust = load(spark, sf_dir, "customer")
    return k_anonymity_audit(cust, ["c_mktsegment", "c_nationkey"],
                             "c_acctbal", k=_KANON_K, l=_KANON_L)


ORACLE_K_ANONYMITY = f"""
WITH total AS (SELECT count(*) AS t FROM customer)
SELECT c_mktsegment, c_nationkey,
       count(*) AS group_size,
       count(DISTINCT c_acctbal) AS n_sensitive,
       round(count(*) / (SELECT t FROM total)::DOUBLE, 6)
           AS pct_of_table,
       count(*) < {_KANON_K} AS k_violation,
       count(DISTINCT c_acctbal) < {_KANON_L} AS l_violation
FROM customer GROUP BY 1, 2
"""

REGISTRY_DATAENG.update({
    "q234_k_anonymity": (q_k_anonymity, ORACLE_K_ANONYMITY),
})
