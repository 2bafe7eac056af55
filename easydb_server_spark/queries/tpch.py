"""Classic TPC-H query shapes over the test tables — the canonical
multi-join/aggregate/top-k plans a warehouse engine must run well.

Complements the operator-level conformance queries with full composed
workloads (the reference executes arbitrary SELECTs through DataFusion,
so these are in-scope behavior, not superset):

- Q3  shipping priority: 3-way join, group, revenue top-10
  (TakeOrderedAndProject — never a global sort at scale);
- Q7  volume shipping: 6-way join, the nation dim broadcast twice
  under different roles, symmetric two-nation predicate;
- Q10 returned-item reporting: 4-way join with date window, top-20;
- Q14 promotion effect: conditional aggregation ratio over fact⋈dim;
- Q18 large-volume customers: join against a HAVING-filtered
  aggregate subquery on the fact table;
- Q19 discounted revenue: OR-of-ANDs brand/quantity/size predicate —
  the classic optimizer pushdown test (literals adapted to the
  synthetic dialect: NATION_n, PROMO, Brand#nn).

Money sums are decimal-exact (cast before SUM) so the DuckDB oracle
matches bit-for-bit regardless of either engine's summation order —
the convention from queries/core.py / timeseries.py.

Scale shape: only the truly bounded dims (nation = 25 rows, region = 5)
carry an explicit ``F.broadcast`` hint. SF-proportional tables
(customer/supplier/part — billions of rows at the 100 TB design point)
get NO hint: Spark's size estimate + AQE's dynamic join selection pick
broadcast-hash when the (filtered) side fits under
``autoBroadcastJoinThreshold`` — which it does at bench scale, so the
plan is unchanged there — and degrade gracefully to sort-merge when it
doesn't, instead of dying at the 8 GB broadcast hard limit a forced
hint would hit (`tests/test_broadcast_gating.py` locks both regimes).
Fact-fact joins shuffle on orderkey only; top-k compiles to
TakeOrderedAndProject.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.functions.exactround import round_div, round_div_sql
from easydb_server_spark.queries._util import load

# Compact-decimal fast path: Spark decimals with precision <= 18 live in
# an unscaled long (whole-stage-codegen friendly); wider ones fall back
# to java.math.BigDecimal per row (~5x slower measured on Q1). Products
# grow precision p1+p2+1, so money at (10,2) x factor at (3,2) -> (14,4)
# -> x(3,2) -> (18,6): every intermediate stays compact. Values are
# still EXACT (prices < 1e8, factors are 2-decimal), so the DuckDB
# oracles keep their DECIMAL(18,6) casts — both engines compute the
# same exact rational and round identically.
_MONEY = "decimal(10,2)"  # l_extendedprice, l_quantity: exact cents
_FACTOR = "decimal(3,2)"  # (1 - l_discount), (1 + l_tax): in [0, 1.08]


def _one_minus_disc() -> F.Column:
    return (F.lit(1).cast(_FACTOR) - F.col("l_discount").cast(_FACTOR)).cast(_FACTOR)


def _revenue() -> F.Column:
    return F.sum(F.col("l_extendedprice").cast(_MONEY) * _one_minus_disc())


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: BUILDING-segment orders not yet shipped at
    the cutoff, ranked by outstanding revenue."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-06-30")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-06-30")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(_revenue(), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


ORACLE_TPCH_Q3 = """
SELECT l_orderkey, o_orderdate,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate  > TIMESTAMP '1998-06-30'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: customers who returned items in a
    quarter, ranked by lost revenue (top-20)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(_revenue(), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE_TPCH_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity exceeds
    the threshold.

    Single lineitem scan: because ``o_orderkey`` is unique in orders,
    the textbook re-aggregation after the semi-join groups to exactly
    one row per qualifying order — so the per-order quantity computed
    for the HAVING filter IS the final measure. Aggregate once, filter,
    then join the (tiny) qualifying-order aggregate up to orders and
    customer. Halves the fact-table IO vs the literal two-scan form;
    the oracle keeps the textbook shape and matches bit-for-bit."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ord_qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_MONEY)).alias("tot_qty"))
        .where(F.col("tot_qty") > 100)
    )
    return (
        ord_qty.join(o, ord_qty.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("tot_qty"), 2).cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(50)
    )


ORACLE_TPCH_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_qty
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 100
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping: revenue flowing between two nations in both
    directions, by supplier-nation/customer-nation/year. Five-way join
    with both nation dims broadcast twice under different roles."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(_revenue(), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: share of revenue from PROMO-type parts in
    one month — conditional aggregation over a fact⋈dim join."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    p = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice").cast(_MONEY) * _one_minus_disc()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(14,4)"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            # exact decimal(·,4) sums -> unscaled INT64; the percentage
            # rounds the exact rational 100*_np/_nv in integer space
            # (functions/exactround) so midpoint tie-breaks can't
            # diverge between engines
            (F.sum(promo) * 10000).cast("bigint").alias("_np"),
            (F.sum(vol) * 10000).cast("bigint").alias("_nv"),
        )
        .select(round_div("_np * 100", "_nv", 6).alias("promo_revenue_pct"))
    )


ORACLE_TPCH_Q14 = """
SELECT {pct} AS promo_revenue_pct
FROM (
  SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,6))
                         * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,4)) * 10000
            AS BIGINT) AS _np,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                       * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
                   AS DECIMAL(38,4)) * 10000
            AS BIGINT) AS _nv
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-06-01'
    AND l_shipdate <  TIMESTAMP '1997-07-01'
)
""".format(pct=round_div_sql("_np * 100", "_nv", 6, "duckdb"))


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue: disjunction of brand/quantity/size
    conjunctions — the classic optimizer test for OR-of-ANDs predicate
    handling across a fact⋈dim join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    arm = lambda brand, qlo, qhi, smax: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("l_quantity").between(qlo, qhi)
        & F.col("p_size").between(1, smax)
    )
    return (
        j.where(arm("Brand#12", 1, 11, 5) | arm("Brand#23", 10, 20, 10) | arm("Brand#15", 20, 30, 15))
        .agg(F.round(_revenue(), 2).cast("double").alias("revenue"))
    )


ORACLE_TPCH_Q19 = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""
