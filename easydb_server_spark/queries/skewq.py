"""Conformance wrappers for the skew-mitigation operators — salted
plans must be row-identical to their unsalted oracles."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.operators.skew import salted_aggregate, salted_join
from easydb_server_spark.queries._util import load


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem (large, salted) ⋈ supplier (small, replicated 8×) —
    must equal the plain join."""
    li = load(spark, sf_dir, "lineitem").withColumnRenamed("l_suppkey", "suppkey")
    s = load(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "suppkey")
    joined = salted_join(li, s.select("suppkey", "s_name"), on="suppkey", n_salts=8)
    return (
        joined.groupBy("s_name")
        .agg(F.count("*").alias("n_items"), F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
        .orderBy("s_name")
    )


ORACLE_SKEW_SALTED_JOIN = """
SELECT s_name, COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 2) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY s_name
"""


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level salted aggregation on a genuinely hot key
    (l_returnflag has 3 values → each holds ~1/3 of the table)."""
    li = load(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        key="l_returnflag",
        agg_exprs={
            "n": "count",
            "total_qty": "sum:l_quantity",
            "min_price": "min:l_extendedprice",
            "max_price": "max:l_extendedprice",
        },
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round("total_qty", 2).alias("total_qty"),
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
    ).orderBy("l_returnflag")


ORACLE_SKEW_SALTED_AGG = """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS total_qty,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""
