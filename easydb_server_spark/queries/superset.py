"""Documented-superset operators — capabilities beyond the reference's
DataFusion surface that Spark provides natively (SURVEY.md §2.A note
recommends shipping them): JSON functions, PIVOT, mode().

Each still gets a DuckDB oracle (emulated where DuckDB lacks the
spelling) so the superset is correctness-checked, not just claimed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.queries._util import load


def q_sup_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → typed struct + schema_of/json path extraction over
    the events props column."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return (
        e.where(F.col("event_id") <= 3000)
        .select(
            "event_id",
            parsed.getField("k").alias("k_typed"),
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("k_path"),
            F.json_array_length(F.concat(F.lit("[1,2,"), F.lit("3]"))).alias("arr_len"),
        )
        .orderBy("event_id")
    )


ORACLE_SUP_JSON = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
       CAST(json_array_length('[1,2,3]') AS INT)      AS arr_len
FROM events WHERE event_id <= 3000
ORDER BY event_id
"""


def q_sup_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per status × priority-column. Spark's
    relational pivot; the oracle is the equivalent CASE aggregation."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .withColumnsRenamed({"1-URGENT": "urgent", "2-HIGH": "high", "3-MEDIUM": "medium"})
        .orderBy("o_orderstatus")
    )


ORACLE_SUP_PIVOT = """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH')   AS high,
       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q_sup_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() aggregate (most frequent value; unique by construction
    here so both engines agree deterministically)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.mode("l_returnflag").alias("mode_flag"),
        F.mode("l_linenumber").alias("mode_line"),
    )


ORACLE_SUP_MODE = """
SELECT MODE(l_returnflag) AS mode_flag,
       CAST(MODE(l_linenumber) AS INT) AS mode_line
FROM lineitem
"""


def q_sup_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide measures -> long key/value rows) — relational
    melt; the oracle is the classic measure-lateral CROSS JOIN."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") <= 64)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "val",
        )
        .withColumn("val", F.round("val", 2))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


ORACLE_SUP_UNPIVOT = """
SELECT l_orderkey, l_linenumber, m.measure,
       ROUND(CASE m.measure
               WHEN 'l_quantity'      THEN l_quantity
               WHEN 'l_extendedprice' THEN l_extendedprice
               WHEN 'l_discount'      THEN l_discount
               WHEN 'l_tax'           THEN l_tax
             END, 2) AS val
FROM lineitem,
     (VALUES ('l_quantity'), ('l_extendedprice'), ('l_discount'), ('l_tax')) m(measure)
WHERE l_orderkey <= 64
ORDER BY l_orderkey, l_linenumber, m.measure
"""


def q_sup_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join with per-row ORDER BY + LIMIT
    (top-2 orders per customer) — DataFusion 47 has no LATERAL; Spark
    plans the correlation as a window under the hood, so there is no
    per-customer re-execution at scale."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"_sup_lat_{t}")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM _sup_lat_customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM _sup_lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey <= 300
        ORDER BY c.c_custkey, t.o_orderkey
        """
    )


ORACLE_SUP_LATERAL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t ON true
WHERE c.c_custkey <= 300
ORDER BY c.c_custkey, t.o_orderkey
"""


def q_sup_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT semi-structured type: parse_json → open-schema
    variant, typed path extraction, null path probing. The oracle is
    DuckDB's JSON extraction over the same props column."""
    e = load(spark, sf_dir, "events")
    e.createOrReplaceTempView("_sup_var_events")
    return spark.sql(
        """
        SELECT event_id,
               variant_get(parse_json(props), '$.k', 'int')       AS k_typed,
               variant_get(parse_json(props), '$.missing', 'int') AS k_missing,
               variant_get(parse_json(props), '$.k', 'string')    AS k_str
        FROM _sup_var_events
        WHERE event_id <= 3000
        ORDER BY event_id
        """
    )


ORACLE_SUP_VARIANT = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT)       AS k_typed,
       CAST(json_extract_string(props, '$.missing') AS INT) AS k_missing,
       json_extract_string(props, '$.k')                    AS k_str
FROM events
WHERE event_id <= 3000
ORDER BY event_id
"""


def q_sup_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order (lambda) array functions over the embedding
    column: aggregate (left fold), filter, transform. Both engines
    left-fold doubles in array order, so sums match bit-for-bit
    (rounded to absorb round-off display differences)."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.where(F.col("vec_id") <= 200)
        .select(
            "vec_id",
            F.round(
                F.expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"),
                4,
            ).alias("vec_sum"),
            F.expr("size(filter(embedding, x -> x > 0))").alias("n_pos"),
            F.round(F.expr("transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)")[0], 4).alias(
                "first_x2"
            ),
        )
        .orderBy("vec_id")
    )


ORACLE_SUP_HIGHER_ORDER = """
SELECT vec_id,
       ROUND(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (acc, x) -> acc + x), 4)
         AS vec_sum,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       ROUND(CAST(embedding[1] AS DOUBLE) * 2.0, 4)         AS first_x2
FROM embeddings
WHERE vec_id <= 200
ORDER BY vec_id
"""
