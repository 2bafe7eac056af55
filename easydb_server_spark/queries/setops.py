"""Set operations (SURVEY.md §2.B "Set operations")."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.queries._util import load


def _urgent_custs(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.where(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))


def _big_custs(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.where(F.col("o_totalprice") > 280000).select(F.col("o_custkey").alias("custkey"))


def q_setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (deduplicating) = union + aggregate-distinct."""
    return _urgent_custs(spark, sf_dir).union(_big_custs(spark, sf_dir)).distinct().orderBy("custkey")


ORACLE_UNION = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 280000
ORDER BY custkey
"""


def q_setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no shuffle — pure concatenation)."""
    u = _urgent_custs(spark, sf_dir).unionAll(_big_custs(spark, sf_dir))
    return u.groupBy("custkey").agg(F.count("*").alias("appearances")).orderBy("custkey")


ORACLE_UNION_ALL = """
SELECT custkey, COUNT(*) AS appearances FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_custkey FROM orders WHERE o_totalprice > 280000
) t GROUP BY custkey ORDER BY custkey
"""


def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics)."""
    return _urgent_custs(spark, sf_dir).intersect(_big_custs(spark, sf_dir)).orderBy("custkey")


ORACLE_INTERSECT = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 280000
ORDER BY custkey
"""


def q_setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the two)."""
    return (
        _urgent_custs(spark, sf_dir)
        .intersectAll(_big_custs(spark, sf_dir))
        .groupBy("custkey")
        .agg(F.count("*").alias("multiplicity"))
        .orderBy("custkey")
    )


ORACLE_INTERSECT_ALL = """
SELECT custkey, COUNT(*) AS multiplicity FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_totalprice > 280000
) t GROUP BY custkey ORDER BY custkey
"""


def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference) — Spark `subtract` = EXCEPT DISTINCT."""
    return _urgent_custs(spark, sf_dir).subtract(_big_custs(spark, sf_dir)).orderBy("custkey")


ORACLE_EXCEPT = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 280000
ORDER BY custkey
"""


def q_setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicities subtract)."""
    return (
        _urgent_custs(spark, sf_dir)
        .exceptAll(_big_custs(spark, sf_dir))
        .groupBy("custkey")
        .agg(F.count("*").alias("multiplicity"))
        .orderBy("custkey")
    )


ORACLE_EXCEPT_ALL = """
SELECT custkey, COUNT(*) AS multiplicity FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_totalprice > 280000
) t GROUP BY custkey ORDER BY custkey
"""
