"""Aggregation operators (SURVEY.md §2.B "Aggregations").

The reference reaches all of these through DataFusion's ``ctx.sql``
(`/root/reference/src/data_source/context.rs:26-28`); here each is the
idiomatic Spark DataFrame plan. Catalyst automatically runs every
groupBy as a two-phase (partial → final) hash aggregate, so map-side
combine is free — at 100 TB the shuffle carries only per-group partial
states, not rows.

Float outputs are rounded so the value-hash comparison with the DuckDB
oracle is stable; integer sums are cast to BIGINT on the oracle side
(DuckDB SUM(BIGINT) → HUGEINT).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.functions.exactround import round_div, round_div_sql
from easydb_server_spark.queries._util import load


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: multi-aggregate hash aggregation.

    Two-phase agg over 6 measures; at scale this is a single shuffle of
    tiny partial-state rows (4 groups), AQE coalesces to 1 partition.

    Money math follows the repo decimal convention (queries/tpch2.py):
    cast to compact decimal BEFORE summing so the sums are exact and
    order-free (the repartition-invariance sweep caught the raw-double
    formulation flipping a ROUND(,2) boundary between partitionings);
    averages round the exact rational sum/count in INT64
    (functions/exactround — ROUND(double, k) tie-breaks midpoints
    differently on Spark vs DuckDB, and avg over a count denominator
    hits exact midpoints at ~1/count per group).
    """
    li = load(spark, sf_dir, "lineitem")
    money = "decimal(10,2)"
    factor = "decimal(3,2)"
    qty = F.col("l_quantity").cast(money)
    price = F.col("l_extendedprice").cast(money)
    disc = F.col("l_discount").cast(factor)
    vol = price * (F.lit(1).cast(factor) - disc).cast(factor)
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(vol), 2).cast("double").alias("sum_disc_price"),
            (F.sum(qty) * 100).cast("bigint").alias("_nq"),
            (F.sum(disc) * 100).cast("bigint").alias("_nd"),
            cnt.alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            round_div("_nq", "count_order * 100", 4).alias("avg_qty"),
            round_div("_nd", "count_order * 100", 4).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price,
       {avg_qty} AS avg_qty,
       {avg_disc} AS avg_disc,
       count_order
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)      AS sum_qty,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)
              AS DOUBLE)                                                       AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS BIGINT)     AS _nq,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) * 1000000 AS BIGINT)     AS _nd,
         COUNT(*)                                                             AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
)
ORDER BY l_returnflag, l_linestatus
""".format(
    avg_qty=round_div_sql("_nq", "count_order * 1000000", 4, "duckdb"),
    avg_disc=round_div_sql("_nd", "count_order * 1000000", 4, "duckdb"),
)


def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT x) / sum(DISTINCT x): expand-based distinct agg.

    Catalyst rewrites mixed distinct/non-distinct aggs with Expand
    (RewriteDistinctAggregates) — still one shuffle pass.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_COUNT_DISTINCT = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey)              AS distinct_supps,
       ROUND(SUM(DISTINCT l_quantity), 2)     AS sum_distinct_qty,
       COUNT(*)                               AS cnt
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar families."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
            F.round(F.var_pop("l_discount"), 8).alias("varp_disc"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 8).alias("corr_price_qty"),
            F.round(F.covar_samp("l_extendedprice", "l_discount"), 6).alias("covs_price_disc"),
        )
        .orderBy("l_linestatus")
    )


ORACLE_STATS = """
SELECT l_linestatus,
       ROUND(STDDEV_SAMP(l_extendedprice), 4)          AS std_price,
       ROUND(VAR_POP(l_discount), 8)                   AS varp_disc,
       ROUND(CORR(l_extendedprice, l_quantity), 8)     AS corr_price_qty,
       ROUND(COVAR_SAMP(l_extendedprice, l_discount), 6) AS covs_price_disc,
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q_agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_slope/intercept/r2/count
    — DataFusion's regr_* surface, Spark 3.4+ builtins)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 4).alias("slope"),
            F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4).alias("intercept"),
            F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 8).alias("r2"),
            F.expr("regr_count(l_extendedprice, l_quantity)").alias("n"),
        )
        .orderBy("l_linestatus")
    )


ORACLE_REGR = """
SELECT l_linestatus,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 8)        AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-selection aggregates: min_by / max_by / first-last value.

    Keyed on the unique o_orderkey so results are deterministic.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_totalprice", "o_orderkey").alias("price_at_last_order"),
            F.min_by("o_totalprice", "o_orderkey").alias("price_at_first_order"),
            F.max("o_orderkey").alias("last_orderkey"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_MINMAX_BY = """
SELECT o_orderpriority,
       MAX_BY(o_totalprice, o_orderkey) AS price_at_last_order,
       MIN_BY(o_totalprice, o_orderkey) AS price_at_first_order,
       MAX(o_orderkey)                  AS last_orderkey
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg / string_agg: collect-to-list with deterministic order.

    Spark: collect_set → sort_array → concat. At scale collect_list on
    a huge group is a memory hazard; keyed here on the 5-row region dim.
    """
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations_csv"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


ORACLE_STRING_AGG = """
SELECT r_name,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations_csv,
       COUNT(*)                                AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER (WHERE ...) clause on aggregates (conditional agg)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("big_orders"),
            F.round(
                F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).otherwise(F.lit(0.0))),
                2,
            ).alias("urgent_revenue"),
            F.count("*").alias("total_orders"),
        )
        .orderBy("o_orderstatus")
    )


ORACLE_FILTER_CLAUSE = """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_totalprice > 100000)  AS big_orders,
       ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 0), 2) AS urgent_revenue,
       COUNT(*)                                       AS total_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-grouping with grouping() marker."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.grouping("o_orderpriority").cast("int").alias("is_priority_total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ORACLE_ROLLUP = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*)                                  AS cnt,
       ROUND(SUM(o_totalprice), 2)               AS revenue,
       CAST(GROUPING(o_orderpriority) AS INT)    AS is_priority_total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE multi-grouping (all 4 grouping-set combinations)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


ORACLE_CUBE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


ORACLE_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        .where(F.col("cnt") > 550)
        .orderBy("l_suppkey")
    )


ORACLE_HAVING = """
SELECT l_suppkey, COUNT(*) AS cnt, ROUND(SUM(l_extendedprice), 2) AS rev
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(*) > 550
ORDER BY l_suppkey
"""


def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median + exact interpolated percentile (DataFusion's
    median/approx_percentile_cont surface; Spark `percentile` is exact)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_quantity"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_PERCENTILES = """
SELECT l_returnflag,
       ROUND(MEDIAN(l_quantity), 4)                  AS median_qty,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25_price,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS p95_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and/bool_or and bit_and/bit_or/bit_xor reductions."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_big_discount"),
            F.bit_and("l_linenumber").alias("band"),
            F.bit_or("l_linenumber").alias("bor"),
            F.bit_xor("l_linenumber").alias("bxor"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_BOOL_BIT = """
SELECT l_returnflag,
       BOOL_AND(l_quantity > 0)     AS all_positive,
       BOOL_OR(l_discount > 0.09)   AS any_big_discount,
       CAST(BIT_AND(l_linenumber) AS INT) AS band,
       CAST(BIT_OR(l_linenumber) AS INT)  AS bor,
       CAST(BIT_XOR(l_linenumber) AS INT) AS bxor
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). No SQL oracle: HLL sketch
    estimates are implementation-specific (Spark HLL++ vs DuckDB HLL), so
    the driver records the weaker rows-only check for this one."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag")
    )


def q_agg_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gradeable invariant companion to q_agg_approx_distinct
    (the emb_pca_invariants pattern): the HLL estimate itself is
    implementation-defined, but its ERROR BOUND is a replayable fact —
    at rsd=0.01, |approx − exact| ≤ max(5%·exact, 100/20) is ~5σ, so
    the boolean is TRUE on any data the driver regenerates. The bound
    predicate is pure integer (20·|Δ| ≤ max(exact, 100)); the exact
    count and group size are oracle-exact columns."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("_approx"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.count(F.lit(1)).alias("cnt"),
    )
    within = F.lit(20).cast("bigint") * F.abs(
        F.col("_approx").cast("bigint") - F.col("exact_orders").cast("bigint")
    ) <= F.greatest(F.col("exact_orders").cast("bigint"), F.lit(100).cast("bigint"))
    return agg.select(
        "l_returnflag",
        F.col("exact_orders").cast("long").alias("exact_orders"),
        F.col("cnt").cast("long").alias("cnt"),
        within.alias("within_bound"),
    ).orderBy("l_returnflag")


ORACLE_APPROX_DISTINCT_BOUND = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       TRUE AS within_bound
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""
