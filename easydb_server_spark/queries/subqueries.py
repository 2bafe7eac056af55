"""Subqueries, CTEs, derived tables, UNNEST, VALUES, recursive CTE
(SURVEY.md §2.B "Subqueries, CTEs, table functions").

Catalyst decorrelates EXISTS/IN/scalar subqueries into joins
(RewritePredicateSubquery / RewriteCorrelatedScalarSubquery) — same
strategy DataFusion applies for the reference. Recursive CTEs are the
one §2.B feature Catalyst lacks; implemented as a driver-side
iterative DataFrame loop (each iteration is a distributed join, only
the frontier is re-unioned — the standard Spark pattern for
transitive closure).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.queries._util import load, register_views


def q_subq_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH ... AS: named subqueries, one referencing another."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH cust_spend AS (
          SELECT o_custkey, SUM(o_totalprice) AS spend, COUNT(*) AS n_orders
          FROM orders GROUP BY o_custkey
        ),
        tiers AS (
          SELECT o_custkey, n_orders,
                 CASE WHEN spend > 1500000 THEN 'gold'
                      WHEN spend > 800000  THEN 'silver'
                      ELSE 'bronze' END AS tier
          FROM cust_spend
        )
        SELECT tier, COUNT(*) AS customers, SUM(n_orders) AS orders
        FROM tiers GROUP BY tier ORDER BY tier
        """
    )


ORACLE_CTE = """
WITH cust_spend AS (
  SELECT o_custkey, SUM(o_totalprice) AS spend, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
tiers AS (
  SELECT o_custkey, n_orders,
         CASE WHEN spend > 1500000 THEN 'gold'
              WHEN spend > 800000  THEN 'silver'
              ELSE 'bronze' END AS tier
  FROM cust_spend
)
SELECT tier, COUNT(*) AS customers, CAST(SUM(n_orders) AS BIGINT) AS orders
FROM tiers GROUP BY tier ORDER BY tier
"""


def q_subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in WHERE (avg-price threshold)."""
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT p_partkey, p_name, ROUND(p_retailprice, 2) AS price
        FROM part
        WHERE p_retailprice > 1.03 * (SELECT AVG(p_retailprice) FROM part)
        ORDER BY p_partkey
        """
    )


ORACLE_SCALAR = """
SELECT p_partkey, p_name, ROUND(p_retailprice, 2) AS price
FROM part
WHERE p_retailprice > 1.03 * (SELECT AVG(p_retailprice) FROM part)
ORDER BY p_partkey
"""


def q_subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in SELECT list (per-nation count)."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT n_nationkey, n_name,
               (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS customers
        FROM nation n
        ORDER BY n_nationkey
        """
    )


ORACLE_CORRELATED_SCALAR = """
SELECT n_nationkey, n_name,
       (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS customers
FROM nation n
ORDER BY n_nationkey
"""


def q_subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — decorrelated to a semi-join by Catalyst."""
    register_views(spark, sf_dir, ("nation", "region", "supplier"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                              JOIN region ON n_regionkey = r_regionkey
                              WHERE r_name = 'EUROPE')
        ORDER BY s_suppkey
        """
    )


ORACLE_IN_SUBQ = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = 'EUROPE')
ORDER BY s_suppkey
"""


def q_subq_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a nullable probe side — the classic three-valued-
    logic trap (SURVEY.md §7.4). Nulls synthesized with NULLIF."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_nationkey NOT IN (SELECT NULLIF(n_nationkey, 3) FROM nation WHERE n_nationkey < 12)
        ORDER BY c_custkey
        """
    )


ORACLE_NOT_IN_NULLS = """
SELECT c_custkey FROM customer
WHERE c_nationkey NOT IN (SELECT NULLIF(n_nationkey, 3) FROM nation WHERE n_nationkey < 12)
ORDER BY c_custkey
"""


def q_subq_not_in_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a null-free list (the non-degenerate companion to
    q_subq_not_in_nulls, which is empty by three-valued logic)."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 12)
        ORDER BY c_custkey
        """
    )


ORACLE_NOT_IN_PLAIN = """
SELECT c_custkey FROM customer
WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 12)
ORDER BY c_custkey
"""


def q_subq_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived table (FROM (SELECT ...) t) joined against a dim."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    per_supp = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    # relative threshold (scale-free): suppliers above 1.05× mean revenue
    avg_rev = per_supp.agg(F.avg("revenue").alias("avg_rev"))
    return (
        per_supp.join(F.broadcast(s), per_supp.l_suppkey == s.s_suppkey)
        .crossJoin(F.broadcast(avg_rev))
        .where(F.col("revenue") > 1.05 * F.col("avg_rev"))
        .select("s_suppkey", "s_name", "revenue")
        .orderBy("s_suppkey")
    )


ORACLE_DERIVED = """
SELECT s_suppkey, s_name, revenue
FROM (SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem GROUP BY l_suppkey) t
JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue > 1.05 * (SELECT AVG(revenue) FROM
      (SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM lineitem GROUP BY l_suppkey) u)
ORDER BY s_suppkey
"""


def q_subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an extra inequality predicate."""
    register_views(spark, sf_dir, ("lineitem", "supplier"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49.5)
        ORDER BY s_suppkey
        """
    )


ORACLE_EXISTS_CORRELATED = """
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49.5)
ORDER BY s_suppkey
"""


def q_subq_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST / LATERAL expansion: explode an array column to rows."""
    d = load(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 20)
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 10)
        .orderBy("word")
    )


ORACLE_UNNEST = """
SELECT word, COUNT(*) AS n
FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 20) t
GROUP BY word HAVING COUNT(*) >= 10
ORDER BY word
"""


def q_subq_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES literal rowset joined against a real table."""
    register_views(spark, sf_dir, ("nation", "region"))
    return spark.sql(
        """
        SELECT v.label, COUNT(*) AS n
        FROM region r
        JOIN VALUES ('ASIA', 'east'), ('EUROPE', 'west'), ('AMERICA', 'west') AS v(rname, label)
          ON r.r_name = v.rname
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY v.label
        ORDER BY v.label
        """
    )


ORACLE_VALUES = """
SELECT v.label, COUNT(*) AS n
FROM region r
JOIN (VALUES ('ASIA', 'east'), ('EUROPE', 'west'), ('AMERICA', 'west')) v(rname, label)
  ON r.r_name = v.rname
JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY v.label
ORDER BY v.label
"""


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE equivalent — iterative DataFrame fixpoint loop.

    DataFusion supports recursive CTEs through ``ctx.sql``; Catalyst
    does not, so this is the documented custom operator (SURVEY.md
    §7.3): a cumulative-order chain per customer. Semantics mirror the
    oracle's WITH RECURSIVE: start at each customer's first order
    (by date/key) and repeatedly step to the next order while the
    running total stays below a cap. Each iteration is a distributed
    self-join on the frontier only; at scale the frontier shrinks
    every step and the loop depth is bounded.
    """
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= 20)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )
    # next-order edge list: successor by (orderdate, orderkey) per customer
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = (
        o.withColumn("seq", F.row_number().over(w))
        .select("o_custkey", "o_orderkey", "o_totalprice", "seq")
    ).cache()

    base = (
        edges.where(F.col("seq") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("seq"),
            F.col("o_totalprice").alias("running"),
        )
    )
    cap = 500000.0
    result = base.where(F.col("running") < cap)
    frontier = result
    # fixpoint: bounded by max orders per customer; frontier-only join
    for _ in range(50):
        nxt = (
            frontier.alias("f")
            .join(
                edges.alias("e"),
                (F.col("f.o_custkey") == F.col("e.o_custkey"))
                & (F.col("e.seq") == F.col("f.seq") + 1),
            )
            .select(
                F.col("e.o_custkey").alias("o_custkey"),
                F.col("e.o_orderkey").alias("o_orderkey"),
                F.col("e.seq").alias("seq"),
                (F.col("f.running") + F.col("e.o_totalprice")).alias("running"),
            )
            .where(F.col("running") < cap)
        )
        if nxt.isEmpty():
            break
        result = result.unionAll(nxt)
        frontier = nxt
    return (
        result.select(
            "o_custkey", "o_orderkey", "seq", F.round("running", 2).alias("running")
        ).orderBy("o_custkey", "seq")
    )


ORACLE_RECURSIVE_CTE = """
WITH RECURSIVE seqd AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS seq
  FROM orders WHERE o_custkey <= 20
),
chain AS (
  SELECT o_custkey, o_orderkey, seq, o_totalprice AS running
  FROM seqd WHERE seq = 1 AND o_totalprice < 500000
  UNION ALL
  SELECT e.o_custkey, e.o_orderkey, e.seq, c.running + e.o_totalprice
  FROM chain c JOIN seqd e
    ON e.o_custkey = c.o_custkey AND e.seq = c.seq + 1
  WHERE c.running + e.o_totalprice < 500000
)
SELECT o_custkey, o_orderkey, CAST(seq AS BIGINT) AS seq, ROUND(running, 2) AS running
FROM chain ORDER BY o_custkey, seq
"""
