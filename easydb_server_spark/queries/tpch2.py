"""TPC-H Q1–Q22 completion: the 16 queries not already in
``queries/tpch.py`` (which carries Q3/Q7/Q10/Q14/Q18/Q19).

The synthetic tables are a REDUCED TPC-H schema (TESTDATA.md): no
partsupp table, no commit/receipt dates, no addresses/phones/comments,
no p_mfgr/p_container. Queries whose classic text needs a missing
column are ADAPTED — the adaptation keeps the query's *plan shape*
(the thing a query engine is exercised by: correlated min subquery,
double-EXISTS anti pattern, scalar-aggregate threshold, …) and swaps
only the unavailable attribute for an available proxy. Each docstring
states the substitution. Literals use the synthetic dialect
(NATION_n, ECONOMY/SMALL/…, Brand#nn) like queries/tpch.py.

Money math follows the repo convention: cast to decimal before SUM so
both engines agree bit-for-bit regardless of summation order (Spark
side uses compact precisions — see the _MONEY/_FACTOR note below);
averages/ratios round the exact unscaled-BIGINT rational in integer
space (functions/exactround) — ROUND(double, k) tie-breaks exact
decimal midpoints differently on Spark vs DuckDB, and count
denominators hit midpoints at ~1/count per group.

Scale shape (see tpch.py): only nation/region carry ``F.broadcast``;
customer/supplier/part are unhinted so AQE broadcasts them while small
and sort-merges beyond the threshold. Scalar aggregates (Q11/Q15/Q17/
Q22 thresholds) are 1-row broadcast cross-joins, never ``.collect()``.
Top-k orderings compile to TakeOrderedAndProject.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from easydb_server_spark.functions.exactround import round_div, round_div_sql
from easydb_server_spark.queries._util import load

# Compact-decimal fast path (see queries/tpch.py): keep every decimal
# intermediate at precision <= 18 so Spark stays on the unscaled-long
# representation instead of per-row BigDecimal (~5x slower, measured on
# Q1). Values remain exact, so the DuckDB oracles keep DECIMAL(18,6) —
# both engines compute the same exact rational.
_MONEY = "decimal(10,2)"  # prices/quantities/balances: exact cents
_FACTOR = "decimal(3,2)"  # discount/tax factors in [0, 1.08]


def _dec(col: str) -> F.Column:
    return F.col(col).cast(_MONEY)


def _vol() -> F.Column:
    """l_extendedprice * (1 - l_discount), decimal-exact: (10,2)x(3,2)
    -> (14,4), compact."""
    disc = (F.lit(1).cast(_FACTOR) - F.col("l_discount").cast(_FACTOR)).cast(_FACTOR)
    return _dec("l_extendedprice") * disc


_VOL_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))"
)


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary report: full-width aggregate over lineitem
    with a ship-date cutoff — the canonical scan+partial-agg plan
    (one pass, map-side combine, 6-row result)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "2001-09-01")
    charge = _vol() * (F.lit(1).cast(_FACTOR) + F.col("l_tax").cast(_FACTOR)).cast(_FACTOR)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(_vol()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            # averages: exact INT64 rounding of sum/count (exactround
            # — ROUND(double) is engine-ambiguous at 6-dec midpoints)
            (F.sum(_dec("l_quantity")) * 100).cast("bigint").alias("_nq"),
            (F.sum(_dec("l_extendedprice")) * 100).cast("bigint").alias("_np"),
            (F.sum(_dec("l_discount")) * 100).cast("bigint").alias("_nd"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            round_div("_nq", "count_order * 100", 6).alias("avg_qty"),
            round_div("_np", "count_order * 100", 6).alias("avg_price"),
            round_div("_nd", "count_order * 100", 6).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price, sum_charge,
       {round_div_sql("_nq", "count_order * 1000000", 6, "duckdb")} AS avg_qty,
       {round_div_sql("_np", "count_order * 1000000", 6, "duckdb")} AS avg_price,
       {round_div_sql("_nd", "count_order * 1000000", 6, "duckdb")} AS avg_disc,
       count_order
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
         CAST(ROUND(SUM({_VOL_SQL}), 2) AS DOUBLE) AS sum_disc_price,
         CAST(ROUND(SUM({_VOL_SQL} * (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6)))), 2)
              AS DOUBLE) AS sum_charge,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS _nq,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS _np,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS _nd,
         COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2001-09-01'
  GROUP BY l_returnflag, l_linestatus
)
ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier (adapted: no partsupp — the
    part↔supplier cost relation is DERIVED from lineitem as the average
    unit price each supplier charged for the part; classic
    ps_supplycost semantics, same correlated-min plan shape).
    ECONOMY parts up to size 15, suppliers in EUROPE."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 15)
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    # per-(part, supplier) qty sums are TINY (a handful of lineitems),
    # so price/qty hits exact 4-decimal midpoints at a real rate: round
    # the rational in INT64 (functions/exactround), never the double
    cost = round_div("_np", "_nq", 4).alias("supply_cost")
    eu_s = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # restrict lineitem to EUROPE suppliers BEFORE the per-(part,
    # supplier) cost aggregate: 1-of-5-regions smaller shuffle at any
    # scale, and per-pair aggregates only ever mix one supplier's rows,
    # so dropping non-EU suppliers' rows cannot change the kept groups.
    # The filter side is a keys-only projection of one region's slice
    # of the supplier DIM — broadcast it so the fact table is filtered
    # in place (scan → semi → partial agg) instead of shuffled on
    # suppkey just to be discarded
    eu_keys = F.broadcast(eu_s.select("s_suppkey"))
    li_eu = li.join(eu_keys, li.l_suppkey == F.col("s_suppkey"), "left_semi")
    ps = (
        li_eu.groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(
            (F.sum(_dec("l_extendedprice")) * 100).cast("bigint").alias("_np"),
            (F.sum(_dec("l_quantity")) * 100).cast("bigint").alias("_nq"),
        )
        .select("partkey", "suppkey", cost)
    )
    eu_ps = ps.join(eu_s, ps.suppkey == eu_s.s_suppkey)
    w = Window.partitionBy("partkey")
    best = eu_ps.withColumn("min_cost", F.min("supply_cost").over(w)).where(
        F.col("supply_cost") == F.col("min_cost")
    )
    return (
        best.join(p, best.partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


ORACLE_TPCH_Q2 = """
WITH ps AS (
  SELECT partkey, suppkey, (CAST((CASE WHEN (_np) < 0 THEN -((((abs(CAST(_np AS BIGINT)) // (CAST(_nq AS BIGINT))) * 100 + ((abs(CAST(_np AS BIGINT)) % (CAST(_nq AS BIGINT))) * 100) // (CAST(_nq AS BIGINT))) * 100 + ((((abs(CAST(_np AS BIGINT)) % (CAST(_nq AS BIGINT))) * 100) % (CAST(_nq AS BIGINT))) * 100) // (CAST(_nq AS BIGINT))) + (CASE WHEN 2 * (((((abs(CAST(_np AS BIGINT)) % (CAST(_nq AS BIGINT))) * 100) % (CAST(_nq AS BIGINT))) * 100) % (CAST(_nq AS BIGINT))) >= (CAST(_nq AS BIGINT)) THEN 1 ELSE 0 END)) ELSE ((((abs(CAST(_np AS BIGINT)) // (CAST(_nq AS BIGINT))) * 100 + ((abs(CAST(_np AS BIGINT)) % (CAST(_nq AS BIGINT))) * 100) // (CAST(_nq AS BIGINT))) * 100 + ((((abs(CAST(_np AS BIGINT)) % (CAST(_nq AS BIGINT))) * 100) % (CAST(_nq AS BIGINT))) * 100) // (CAST(_nq AS BIGINT))) + (CASE WHEN 2 * (((((abs(CAST(_np AS BIGINT)) % (CAST(_nq AS BIGINT))) * 100) % (CAST(_nq AS BIGINT))) * 100) % (CAST(_nq AS BIGINT))) >= (CAST(_nq AS BIGINT)) THEN 1 ELSE 0 END)) END) AS DOUBLE) / 10000.0) AS supply_cost
  FROM (
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS _np,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS _nq
    FROM lineitem GROUP BY l_partkey, l_suppkey
  )
),
eu AS (
  SELECT ps.*, s_name, s_acctbal, n_name
  FROM ps
  JOIN supplier ON suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
best AS (
  SELECT *, MIN(supply_cost) OVER (PARTITION BY partkey) AS min_cost FROM eu
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM best
JOIN part ON partkey = p_partkey
WHERE supply_cost = min_cost
  AND p_type = 'ECONOMY' AND p_size <= 15
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking (adapted: no commit/receipt dates —
    'late' = some lineitem shipped >30 days after the order date; same
    EXISTS → semi-join + count-by-priority shape)."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-04-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-04-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: ASIA, 1996 — the 6-way join where the
    customer and supplier must share a nation."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_vol()), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


ORACLE_TPCH_Q5 = f"""
SELECT n_name, CAST(ROUND(SUM({_VOL_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting revenue change: pure scan+filter+agg — every
    predicate must push to the parquet scan."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(_dec("l_extendedprice") * F.col("l_discount").cast(_FACTOR)), 2)
        .cast("double")
        .alias("revenue")
    )


ORACLE_TPCH_Q6 = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                      * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_5's share of STANDARD-part
    revenue sold into AMERICA, by order year — two nation roles, a
    conditional-sum ratio per group."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n_c = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_s = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = _vol().alias("volume")
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_c), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n_s), s.s_nationkey == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol, "supp_nation")
    )
    nat = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(14,4)")
    )
    return (
        base.groupBy("o_year")
        .agg(
            # both sums are exact decimal(·,4); the share rounds the
            # exact integer rational in INT64 (functions/exactround)
            (F.sum(nat) * 10000).cast("bigint").alias("_nn"),
            (F.sum("volume") * 10000).cast("bigint").alias("_nv"),
        )
        .select("o_year", round_div("_nn", "_nv", 6).alias("mkt_share"))
        .orderBy("o_year")
    )


ORACLE_TPCH_Q8 = f"""
WITH base AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         {_VOL_SQL} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
SELECT o_year, {round_div_sql("_nn", "_nv", 6, "duckdb")} AS mkt_share
FROM (
  SELECT o_year,
         CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                            ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,4)) * 10000
              AS BIGINT) AS _nn,
         CAST(CAST(SUM(volume) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS _nv
  FROM base
  GROUP BY o_year
)
ORDER BY o_year
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit (adapted: no ps_supplycost — unit cost
    proxied by p_retailprice; same 5-way join + profit-by-nation-year
    shape). Parts whose name contains 'red'."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = _vol() - F.col("p_retailprice").cast("decimal(6,2)") * F.col("l_quantity").cast("decimal(4,1)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


ORACLE_TPCH_Q9 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM({_VOL_SQL}
                      - CAST(p_retailprice AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))), 2)
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock (adapted: no partsupp — per-part 'value' is
    NATION_1 suppliers' lineitem revenue; same scalar-threshold HAVING
    shape: keep parts above 0.1% of the total).

    The grand total is DERIVED from the per-part aggregate (decimal
    sums re-summed — exact, so the double cast matches the oracle's
    global sum), not recomputed from the lineitem⋈supplier join; the
    shared groupBy exchange is reused (ReusedExchange), so the fact
    table is scanned and shuffled once."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    flt = li.join(s, li.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    per_part = flt.groupBy("l_partkey").agg(F.sum(_vol()).alias("value_dec"))
    total = per_part.agg(F.sum("value_dec").cast("double").alias("total_d"))
    return (
        per_part.withColumn("value_d", F.col("value_dec").cast("double"))
        .crossJoin(F.broadcast(total))
        .where(F.col("value_d") > F.lit(0.001) * F.col("total_d"))
        .select("l_partkey", F.round("value_d", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("l_partkey"))
    )


ORACLE_TPCH_Q11 = f"""
WITH flt AS (
  SELECT l_partkey, {_VOL_SQL} AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
)
SELECT l_partkey, ROUND(CAST(SUM(v) AS DOUBLE), 2) AS part_value
FROM flt
GROUP BY l_partkey
HAVING CAST(SUM(v) AS DOUBLE) > 0.001 * (SELECT CAST(SUM(v) AS DOUBLE) FROM flt)
ORDER BY part_value DESC, l_partkey
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode priority counts (adapted: no l_shipmode /
    receipt dates — groups by l_linestatus over lineitems shipped >45
    days after the order date in 1997; same conditional-count shape)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.join(o, li.l_orderkey == o.o_orderkey).where(
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        & (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        j.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


ORACLE_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution (adapted: the classic
    o_comment NOT LIKE filter becomes an o_orderpriority filter — same
    left-join + double-aggregate shape)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_TPCH_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority != '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: revenue view over a quarter, then the
    supplier(s) hitting the global max — scalar-max subquery as a
    1-row broadcast cross-join (never collected)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(_vol()), 2).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE_TPCH_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         CAST(ROUND(SUM({_VOL_SQL}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev
JOIN supplier ON suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier count by part attributes (adapted: the
    part↔supplier relation comes from lineitem instead of partsupp,
    and the supplier-comment exclusion is dropped; same
    distinct-count-per-attribute-group shape)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(40)
    )


ORACLE_TPCH_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#11'
  AND p_type != 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: Brand#23 lineitems below 20%
    of the part's average quantity (correlated per-part average → one
    aggregate + rejoin on the already-shuffled part key), reported as
    an average yearly figure."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2) * (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_thr")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(thr, li.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thr"))
        .agg((F.sum(_dec("l_extendedprice")) * 100).cast("bigint").alias("_ne"))
        # denominator 7 is the smallest in the suite — exact midpoints
        # at 2 decimals every 7*100 units of _ne; round in INT64
        .select(round_div("_ne", "7 * 100", 2).alias("avg_yearly"))
    )


ORACLE_TPCH_Q17 = """
WITH thr AS (
  SELECT l_partkey AS t_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS qty_thr
  FROM lineitem GROUP BY l_partkey
)
SELECT {avg_yearly} AS avg_yearly
FROM (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS _ne
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN thr  ON l_partkey = t_partkey
  WHERE p_brand = 'Brand#23'
    AND l_quantity < qty_thr
)
""".format(avg_yearly=round_div_sql("_ne", "7 * 1000000", 2, "duckdb"))


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion (adapted: no partsupp availqty —
    'has surplus' = shipped more than 50 units of SMALL-type parts in
    1997; same nested semi-join chain ending in a name list). EUROPE
    suppliers only."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "SMALL").select("p_partkey")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    big = (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(big, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
        .limit(50)
    )


ORACLE_TPCH_Q20 = """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 50
  )
ORDER BY s_name
LIMIT 50
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting (adapted: no receipt /
    commit dates — 'late' = shipped >60 days after the order date;
    same EXISTS + NOT-EXISTS double-correlation on the fact table).
    NATION_2 suppliers, F-status orders.

    Single-scan plan (r5; the same trick as Q18's r3 rewrite): instead
    of three lineitem branches (base + EXISTS semi + NOT-EXISTS anti —
    3× fact-table I/O and two extra fact shuffles), aggregate ONCE per
    (orderkey, suppkey), counting that supplier's late lines, then
    resolve both correlated predicates with order-level window counts
    over the already-tiny aggregated frame:

    - EXISTS(other supplier on the order)     ⇔ n_supps > 1
    - NOT EXISTS(other LATE supplier)         ⇔ n_late_supps == 1
      (this supplier is late, so it accounts for the single late one)

    numwait then sums the per-pair late-line counts, matching the
    row-level COUNT(*) of the correlated form."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    li = load(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(late, 1).otherwise(0)).alias("n_late_lines"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_pair.withColumn("n_supps", F.count(F.lit(1)).over(w))
        .withColumn("n_late_supps", F.sum((F.col("n_late_lines") > 0).cast("int")).over(w))
        .where(
            (F.col("n_late_lines") > 0) & (F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)
        )
    )
    nat_s = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey", "s_name")
    return (
        flagged.join(nat_s, flagged.l_suppkey == nat_s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


ORACLE_TPCH_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_2'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey != l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey != l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity (adapted: no c_phone — the country
    code becomes c_nationkey, and 'never ordered' becomes 'no order
    since 2000', which is non-empty on the synthetic data; same shape:
    scalar-average threshold + anti-join against orders + per-country
    rollup)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") >= "2000-01-01")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


ORACLE_TPCH_Q22 = """
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY cntrycode
"""
