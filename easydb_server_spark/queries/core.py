"""Projections, filters, conditionals, casts, DISTINCT [ON]
(SURVEY.md §2.B "Projections / filters / predicates").

These compile to a single WholeStageCodegen span over the parquet
scan — filters and column pruning push down to the reader
(PushedFilters/ReadSchema in .explain), so at 100 TB only matching
row-groups and referenced columns are read.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from easydb_server_spark.queries._util import load


def q_core_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projections with aliases (scan reads only 4 columns).

    The charge expression goes through exact DECIMAL arithmetic before
    the 2-dp round: rounding a *double* product at a .005 representation
    boundary is engine-dependent (Spark and DuckDB disagree on ~0.05% of
    rows at sf0.1), while decimal round-half-up is deterministic in
    both. Final cast back to double so the wire value is a plain float.
    """
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(12,4)"
    price = F.col("l_extendedprice").cast(dec)
    disc = F.col("l_discount").cast(dec)
    tax = F.col("l_tax").cast(dec)
    one = F.lit(1).cast(dec)
    return (
        li.where(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(price * (one - disc) * (one + tax), 2).cast("double").alias("charge"),
            (F.col("l_quantity") > 25).alias("bulk"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


ORACLE_PROJECTION = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,4))
                  * (1 - CAST(l_discount AS DECIMAL(12,4)))
                  * (1 + CAST(l_tax AS DECIMAL(12,4))), 2) AS DOUBLE) AS charge,
       l_quantity > 25 AS bulk
FROM lineitem
WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber
"""


def q_core_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full predicate surface: AND/OR/NOT, BETWEEN, IN, LIKE, IS NULL,
    null-safe equality (IS NOT DISTINCT FROM ⇔ eqNullSafe)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.where(
            (
                F.col("o_totalprice").between(100000, 150000)
                & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
                & F.col("o_orderstatus").like("%O%")
            )
            | (
                F.nullif(F.col("o_orderstatus"), F.lit("P")).isNull()
                & ~(F.col("o_totalprice") > 50000)
            )
        )
        .where(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).eqNullSafe(F.col("o_orderpriority")))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
    )


ORACLE_FILTER_PREDICATES = """
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE ((o_totalprice BETWEEN 100000 AND 150000
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_orderstatus LIKE '%O%')
   OR (NULLIF(o_orderstatus, 'P') IS NULL AND NOT (o_totalprice > 50000)))
  AND NULLIF(o_orderpriority, '5-LOW') IS NOT DISTINCT FROM o_orderpriority
ORDER BY o_orderkey
"""


def q_core_star_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qualified ``t.*`` expansion plus sibling columns."""
    from easydb_server_spark.queries._util import register_views

    register_views(spark, sf_dir, ("nation", "region"))
    return spark.sql(
        """
        SELECT n.*, r.r_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        ORDER BY n.n_nationkey
        """
    )


ORACLE_STAR_PROJECTION = """
SELECT n.*, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
ORDER BY n.n_nationkey
"""


def q_core_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct().orderBy("o_orderstatus", "o_orderpriority")


ORACLE_DISTINCT = """
SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders ORDER BY o_orderstatus, o_orderpriority
"""


def q_core_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres-style DISTINCT ON (first row per key by sort order) —
    the row_number()=1 window idiom (SURVEY.md §2.B)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("o_custkey") <= 300))
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    )


ORACLE_DISTINCT_ON = """
SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
FROM orders
WHERE o_custkey <= 300
ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
"""


def q_core_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF / GREATEST / LEAST."""
    c = load(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("balance_tier"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias("segment"),
            F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("pos_bal"),
            F.round(F.least(F.col("c_acctbal"), F.lit(1000.0)), 2).alias("capped_bal"),
        )
        .orderBy("c_custkey")
    )


ORACLE_CONDITIONALS = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS balance_tier,
       COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment,
       ROUND(GREATEST(c_acctbal, 0.0), 2) AS pos_bal,
       ROUND(LEAST(c_acctbal, 1000.0), 2) AS capped_bal
FROM customer
WHERE c_custkey <= 500
ORDER BY c_custkey
"""


def q_core_nvl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NVL / IFNULL / NVL2 null-default conditionals (nulls synthesized)."""
    s = load(spark, sf_dir, "supplier")
    maybe = F.nullif(F.col("s_name"), F.lit("Supplier#000000005"))
    return s.select(
        "s_suppkey",
        F.expr("nvl(nullif(s_name, 'Supplier#000000005'), 'MISSING')").alias("nvl_name"),
        F.expr("ifnull(nullif(s_name, 'Supplier#000000005'), 'MISSING')").alias("ifnull_name"),
        F.expr("nvl2(nullif(s_name, 'Supplier#000000005'), 'present', 'absent')").alias("nvl2_flag"),
        maybe.isNull().alias("was_null"),
    ).orderBy("s_suppkey")


ORACLE_NVL = """
SELECT s_suppkey,
       COALESCE(NULLIF(s_name, 'Supplier#000000005'), 'MISSING') AS nvl_name,
       IFNULL(NULLIF(s_name, 'Supplier#000000005'), 'MISSING')   AS ifnull_name,
       CASE WHEN NULLIF(s_name, 'Supplier#000000005') IS NOT NULL THEN 'present' ELSE 'absent' END AS nvl2_flag,
       NULLIF(s_name, 'Supplier#000000005') IS NULL              AS was_null
FROM supplier ORDER BY s_suppkey
"""


def q_core_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / TRY_CAST — TRY_CAST yields NULL on failure."""
    o = load(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            # round-then-cast: Spark's double→bigint cast truncates while
            # DuckDB's rounds, so make the rounding explicit on both sides
            F.round(F.col("o_totalprice"), 0).cast("bigint").alias("price_int"),
            F.col("o_totalprice").cast("string").alias("price_str"),
            F.expr("try_cast(o_orderstatus AS int)").alias("status_as_int"),
            F.expr("try_cast(substring(o_orderpriority, 1, 1) AS int)").alias("prio_num"),
            F.col("o_orderdate").cast("date").cast("string").alias("od"),
        )
        .orderBy("o_orderkey")
    )


ORACLE_CAST = """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice, 0) AS BIGINT)          AS price_int,
       CAST(o_totalprice AS VARCHAR)                   AS price_str,
       TRY_CAST(o_orderstatus AS INT)                  AS status_as_int,
       TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS INT)  AS prio_num,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR)      AS od
FROM orders
WHERE o_orderkey <= 2000
ORDER BY o_orderkey
"""


def q_core_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT/OFFSET — Catalyst fuses into TakeOrderedAndProject
    (distributed top-k: per-partition heads, single merge)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy(F.col("price").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(25)
    )


ORACLE_LIMIT_OFFSET = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders
ORDER BY price DESC, o_orderkey
LIMIT 25 OFFSET 10
"""


def q_core_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with NULLS FIRST/LAST control (nulls synthesized)."""
    s = load(spark, sf_dir, "supplier")
    return (
        s.select(
            "s_suppkey",
            F.nullif((F.col("s_nationkey") % 7).cast("int"), F.lit(0)).alias("grp"),
            F.round("s_acctbal", 2).alias("bal"),
        )
        .orderBy(F.col("grp").asc_nulls_first(), F.col("bal").desc_nulls_last(), F.col("s_suppkey"))
        .limit(40)
    )


ORACLE_SORT_NULLS = """
SELECT s_suppkey,
       CAST(NULLIF(s_nationkey % 7, 0) AS INT) AS grp,
       ROUND(s_acctbal, 2) AS bal
FROM supplier
ORDER BY grp ASC NULLS FIRST, bal DESC NULLS LAST, s_suppkey
LIMIT 40
"""
