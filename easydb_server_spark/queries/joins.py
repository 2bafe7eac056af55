"""Join operators (SURVEY.md §2.B "Joins").

Spark picks the physical join (broadcast-hash / shuffled-hash /
sort-merge) from stats + AQE; we nudge with explicit ``F.broadcast``
ONLY on the truly bounded dims (nation = 25 rows, region = 5). The
100 TB plan shape is: fact table stays partitioned, bounded dims ship
to every executor, and SF-proportional tables (customer/supplier/part)
carry no hint — AQE selects broadcast when the filtered side is under
``autoBroadcastJoinThreshold`` (true at bench scale) and falls back to
sort-merge beyond it rather than hitting the 8 GB broadcast hard
limit. Only fact-fact joins (orders⋈lineitem) shuffle on the key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.functions.exactround import round_div, round_div_sql
from easydb_server_spark.queries._util import load


def q_join_inner_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way inner equi-join + agg (TPC-H Q5 shape).

    nation/region broadcast (bounded dims); customer unhinted — AQE
    broadcasts it while small, sort-merges beyond the threshold;
    orders⋈lineitem shuffles on orderkey.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


ORACLE_INNER_REVENUE = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join: every customer, order stats null-extended to 0."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("big_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("big_spend"),
        )
        .where(F.col("big_orders") <= 1)
        .orderBy("c_custkey")
    )


ORACLE_LEFT_OUTER = """
SELECT c_custkey,
       COUNT(o_orderkey)                          AS big_orders,
       ROUND(COALESCE(SUM(o_totalprice), 0), 2)   AS big_spend
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) o
  ON c_custkey = o_custkey
GROUP BY c_custkey
HAVING COUNT(o_orderkey) <= 1
ORDER BY c_custkey
"""


def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (kept-side = customer)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    c = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.count("o_orderkey").alias("urgent_orders"))
        .orderBy("c_custkey")
    )


ORACLE_RIGHT_OUTER = """
SELECT c_custkey, c_acctbal, COUNT(o_orderkey) AS urgent_orders
FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
RIGHT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
  ON o_custkey = c_custkey
GROUP BY c_custkey, c_acctbal
ORDER BY c_custkey
"""


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates with disjoint key coverage."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cn = (
        c.where(F.col("c_acctbal") > 9500)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("rich_customers"))
    )
    sn = (
        s.where(F.col("s_acctbal") > 8000)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("rich_suppliers"))
    )
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full")
        .select(
            F.coalesce(cn.c_nationkey, sn.s_nationkey).alias("nationkey"),
            F.coalesce(F.col("rich_customers"), F.lit(0)).alias("rich_customers"),
            F.coalesce(F.col("rich_suppliers"), F.lit(0)).alias("rich_suppliers"),
        )
        .orderBy("nationkey")
    )


ORACLE_FULL_OUTER = """
SELECT COALESCE(cn.c_nationkey, sn.s_nationkey)  AS nationkey,
       CAST(COALESCE(cn.rich_customers, 0) AS BIGINT) AS rich_customers,
       CAST(COALESCE(sn.rich_suppliers, 0) AS BIGINT) AS rich_suppliers
FROM (SELECT c_nationkey, COUNT(*) AS rich_customers FROM customer WHERE c_acctbal > 9500 GROUP BY c_nationkey) cn
FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS rich_suppliers FROM supplier WHERE s_acctbal > 8000 GROUP BY s_nationkey) sn
  ON cn.c_nationkey = sn.s_nationkey
ORDER BY nationkey
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with ≥1 urgent big order.

    Semi-join ships only the key column of the probe side — at scale,
    far cheaper than inner-join + distinct.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 200000)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ORACLE_SEMI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 200000)
ORDER BY c_custkey
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no high-value order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


ORACLE_ANTI = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
ORDER BY c_custkey
"""


def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (cartesian) of two small dims."""
    r = load(spark, sf_dir, "region").select("r_name")
    et = load(spark, sf_dir, "events").select("event_type").distinct()
    return r.crossJoin(et).orderBy("r_name", "event_type")


ORACLE_CROSS = """
SELECT r_name, event_type
FROM region CROSS JOIN (SELECT DISTINCT event_type FROM events) e
ORDER BY r_name, event_type
"""


def q_join_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: price-band lookup via BETWEEN predicate.

    Spark executes this as BroadcastNestedLoopJoin — correct choice when
    one side is a handful of band rows.
    """
    p = load(spark, sf_dir, "part")
    # r17: Arrow-created fixture table — the list form parallelized
    # into 32 near-empty Python-RDD partitions (see text_url_blocklist)
    import pandas as pd

    bands = spark.createDataFrame(
        pd.DataFrame(
            [("budget", 0.0, 940.0), ("mid", 940.0, 975.0), ("premium", 975.0, 1e12)],
            columns=["band", "lo", "hi"],
        ),
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("parts"),
            # avg over a count denominator: round the exact rational in
            # INT64 (functions/exactround), never ROUND(double) — Spark
            # and DuckDB tie-break decimal midpoints differently.
            (F.sum(F.col("p_retailprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("_np"),
        )
        .select(
            "band",
            "parts",
            round_div("_np", "parts * 100", 2).alias("avg_price"),
        )
        .orderBy("band")
    )


ORACLE_NONEQUI = """
SELECT band, parts, {avg_price} AS avg_price
FROM (
  SELECT band, COUNT(*) AS parts,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS _np
  FROM part
  JOIN (VALUES ('budget', 0.0, 940.0), ('mid', 940.0, 975.0), ('premium', 975.0, 1e12)) b(band, lo, hi)
    ON p_retailprice >= lo AND p_retailprice < hi
  GROUP BY band
)
ORDER BY band
""".format(avg_price=round_div_sql("_np", "parts * 100", 2, "duckdb"))


def q_join_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USING(col) join — implicit key matching on a shared column name."""
    n = load(spark, sf_dir, "nation").withColumnRenamed("n_regionkey", "regionkey")
    r = load(spark, sf_dir, "region").withColumnRenamed("r_regionkey", "regionkey")
    return (
        n.join(r, ["regionkey"])
        .select("regionkey", "n_name", "r_name")
        .orderBy("n_name")
    )


ORACLE_USING = """
SELECT regionkey, n_name, r_name
FROM (SELECT n_name, n_regionkey AS regionkey FROM nation) n
JOIN (SELECT r_name, r_regionkey AS regionkey FROM region) r USING (regionkey)
ORDER BY n_name
"""
