"""Window functions (SURVEY.md §2.B "Window functions").

All run as a single Window physical operator: one shuffle on the
PARTITION BY key, sort within partitions, then streaming frame
evaluation — the right 100 TB shape as long as no single partition key
is huge (ranking by customer/supplier keeps partitions tiny).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from easydb_server_spark.queries._util import load


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank over PARTITION BY ... ORDER BY."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 5)
        .orderBy("o_orderpriority", "rn")
    )


ORACLE_WINDOW_RANK = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey,
         ROUND(o_totalprice, 2) AS price,
         ROW_NUMBER() OVER w AS rn,
         RANK() OVER w       AS rnk,
         DENSE_RANK() OVER w AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
) t WHERE rn <= 5
ORDER BY o_orderpriority, rn
"""


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with default values over per-customer order history."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.where(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2).alias("delta_prev"),
            F.lead("o_orderkey", 1, -1).over(w).alias("next_orderkey"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORACLE_WINDOW_LAG_LEAD = """
SELECT o_custkey, o_orderkey,
       ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0) OVER w, 2) AS delta_prev,
       LEAD(o_orderkey, 1, -1) OVER w AS next_orderkey
FROM orders
WHERE o_custkey <= 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-as-window: running sum + partition total (ROWS frames)."""
    o = load(spark, sf_dir, "orders")
    wrun = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("o_custkey")
    return (
        o.where(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(wrun), 2).alias("running_spend"),
            F.round(F.sum("o_totalprice").over(wall), 2).alias("total_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORACLE_WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey), 2)   AS total_spend
FROM orders
WHERE o_custkey <= 50
ORDER BY o_custkey, o_orderkey
"""


def q_window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile ranking distributions."""
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return (
        c.where(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            F.round(F.percent_rank().over(w), 8).alias("pr"),
            F.round(F.cume_dist().over(w), 8).alias("cd"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_custkey")
    )


ORACLE_WINDOW_NTILE_DIST = """
SELECT c_custkey,
       ROUND(PERCENT_RANK() OVER w, 8) AS pr,
       ROUND(CUME_DIST() OVER w, 8)    AS cd,
       NTILE(4) OVER w                 AS quartile
FROM customer
WHERE c_custkey <= 200
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


def q_window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with full-partition frame."""
    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        li.where(F.col("l_suppkey") <= 10)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.first("l_orderkey").over(w).alias("first_order"),
            F.last("l_orderkey").over(w).alias("last_order"),
            F.nth_value("l_orderkey", 2).over(w).alias("second_order"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


ORACLE_WINDOW_FIRST_LAST_NTH = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       FIRST_VALUE(l_orderkey) OVER w AS first_order,
       LAST_VALUE(l_orderkey) OVER w  AS last_order,
       NTH_VALUE(l_orderkey, 2) OVER w AS second_order
FROM lineitem
WHERE l_suppkey <= 10
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY l_suppkey, l_orderkey, l_linenumber
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: count of peers within ±5 of each part size."""
    p = load(spark, sf_dir, "part")
    w = Window.orderBy("p_size").rangeBetween(-5, 5)
    return (
        p.where(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            "p_size",
            F.count("*").over(w).alias("peers_within_5"),
        )
        .orderBy("p_partkey")
    )


ORACLE_WINDOW_RANGE_FRAME = """
SELECT p_partkey, p_size,
       COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS peers_within_5
FROM part
WHERE p_partkey <= 500
ORDER BY p_partkey
"""


def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS in lag/last_value — last-observation-carried-forward
    (nulls synthesized: every third order's price is hidden)."""
    o = load(spark, sf_dir, "orders")
    base = o.where(F.col("o_custkey") <= 40).select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.round("o_totalprice", 2))
        .alias("price_maybe"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        base.select(
            "o_custkey",
            "o_orderkey",
            "price_maybe",
            F.last("price_maybe", ignorenulls=True).over(w).alias("locf_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORACLE_WINDOW_IGNORE_NULLS = """
SELECT o_custkey, o_orderkey,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE ROUND(o_totalprice, 2) END AS price_maybe,
       LAST_VALUE(CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE ROUND(o_totalprice, 2) END IGNORE NULLS)
         OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_price
FROM orders WHERE o_custkey <= 40
ORDER BY o_custkey, o_orderkey
"""
