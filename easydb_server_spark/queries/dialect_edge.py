"""Dialect-edge operators (SURVEY.md §7.4 risk 1): the function-name /
frame-spec gaps between DataFusion SQL, Spark SQL, and the oracle.

- ILIKE, levenshtein, split_part, printf-style formatting, bit_count
- overlay / find_in_set (Spark built-ins; DuckDB 1.0 lacks them — the
  oracles emulate with substr/list_position, which *is* the test: our
  engine serves the DataFusion spelling, the oracle proves the result)
- GROUPS window frames: neither Spark nor DuckDB implements GROUPS;
  both sides run the standard dense_rank + RANGE-frame rewrite
  (SURVEY.md §2.B "GROUPS: rewrite with rank").
- NATURAL JOIN (implicit common-column matching).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from easydb_server_spark.queries._util import load, register_views


def q_edge_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """levenshtein / split_part / overlay / find_in_set / printf / bit_count."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.levenshtein(F.col("n_name"), F.lit("FRANCE")).alias("lev_to_france"),
        F.expr("split_part(n_name, ' ', 1)").alias("first_word"),
        F.expr("overlay(n_name PLACING '##' FROM 2 FOR 2)").alias("overlaid"),
        F.expr("find_in_set(n_name, 'FRANCE,GERMANY,CHINA')").alias("in_set_pos"),
        F.format_string("%s-%02d", F.col("n_name"), F.col("n_nationkey")).alias("formatted"),
        F.bit_count(F.col("n_nationkey")).alias("popcount"),
    ).orderBy("n_nationkey")


ORACLE_EDGE_STRING_FNS = """
SELECT n_nationkey,
       CAST(levenshtein(n_name, 'FRANCE') AS INT)            AS lev_to_france,
       split_part(n_name, ' ', 1)                            AS first_word,
       substr(n_name, 1, 1) || '##' || substr(n_name, 4)     AS overlaid,
       CAST(COALESCE(list_position(string_split('FRANCE,GERMANY,CHINA', ','), n_name), 0) AS INT) AS in_set_pos,
       printf('%s-%02d', n_name, n_nationkey)                AS formatted,
       CAST(bit_count(n_nationkey) AS INT)                   AS popcount
FROM nation ORDER BY n_nationkey
"""


def q_edge_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ILIKE case-insensitive pattern matching."""
    p = load(spark, sf_dir, "part")
    return (
        p.where(F.col("p_name").ilike("%WIDGET%") | F.col("p_type").ilike("econ%"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


ORACLE_EDGE_ILIKE = """
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name ILIKE '%WIDGET%' OR p_type ILIKE 'econ%'
ORDER BY p_partkey
"""


def q_edge_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW emulation:
    dense_rank over the order key, then a RANGE frame on the rank —
    peer rows aggregate as one group, exactly GROUPS semantics."""
    o = load(spark, sf_dir, "orders")
    base = o.where(F.col("o_custkey") <= 30).select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("od"), "o_totalprice"
    )
    wr = Window.partitionBy("o_custkey").orderBy("od")
    ranked = base.withColumn("dr", F.dense_rank().over(wr))
    wg = Window.partitionBy("o_custkey").orderBy("dr").rangeBetween(-1, 0)
    return (
        ranked.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(wg), 2).alias("sum_2groups"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORACLE_EDGE_GROUPS_FRAME = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)) AS dr
  FROM orders WHERE o_custkey <= 30
)
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY dr
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS sum_2groups
FROM ranked
ORDER BY o_custkey, o_orderkey
"""


def q_edge_natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN over derived relations sharing `nationkey`."""
    register_views(spark, sf_dir, ("nation", "supplier"))
    return spark.sql(
        """
        SELECT nationkey, n_name, suppliers
        FROM (SELECT n_nationkey AS nationkey, n_name FROM nation)
        NATURAL JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS suppliers
                      FROM supplier GROUP BY s_nationkey)
        ORDER BY nationkey
        """
    )


ORACLE_EDGE_NATURAL_JOIN = """
SELECT nationkey, n_name, suppliers
FROM (SELECT n_nationkey AS nationkey, n_name FROM nation) a
NATURAL JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS suppliers
              FROM supplier GROUP BY s_nationkey) b
ORDER BY nationkey
"""


def q_edge_regexp_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_count (DataFusion/Spark builtin; DuckDB oracle emulates
    via len(regexp_extract_all))."""
    d = load(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.expr("regexp_count(text, 'ta[bg]')").alias("n_tab_tag"),
            F.expr("regexp_count(text, '[0-9]+')").alias("n_numbers"),
        )
        .orderBy("doc_id")
    )


ORACLE_EDGE_REGEXP_COUNT = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, 'ta[bg]')) AS INT) AS n_tab_tag,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers
FROM documents WHERE doc_id < 100
ORDER BY doc_id
"""


def q_edge_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type/engine introspection (DataFusion's arrow_typeof/version →
    Spark typeof()/version()). Type names and version strings are
    engine-specific spellings, so the oracle pins Spark's names as
    literals — the check is that introspection exists and reports the
    right types, not that two engines share vocabulary."""
    o = load(spark, sf_dir, "orders")
    return o.limit(1).select(
        F.expr("typeof(o_orderkey)").alias("t_key"),
        F.expr("typeof(o_totalprice)").alias("t_price"),
        F.expr("typeof(o_orderdate)").alias("t_date"),
        F.expr("typeof(named_struct('a', 1))").alias("t_struct"),
        (F.length(F.expr("version()")) > 0).alias("has_version"),
    )


ORACLE_EDGE_INTROSPECTION = """
SELECT 'bigint'       AS t_key,
       'double'       AS t_price,
       'timestamp_ntz' AS t_date,
       'struct<a:int>' AS t_struct,
       TRUE           AS has_version
FROM orders LIMIT 1
"""


def q_edge_null_safe_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe comparison + remaining DataFusion scalar gaps.

    - ``IS [NOT] DISTINCT FROM`` (SURVEY.md §2.B predicates row) over a
      genuinely nullable expression (NULLIF-derived);
    - ``gcd``/``lcm`` via the Euclid-fold dialect shims (DataFusion
      builtins Spark lacks — `functions/shims.py`), pure JVM-side;
    - ``substr_index`` (DataFusion spelling of substring_index);
    - ``uuid()`` pinned to its only deterministic property (length 36).
    Reference surface: ctx.sql at /root/reference/src/data_source/context.rs:26-28.
    """
    from easydb_server_spark.functions import register_dialect_shims

    register_dialect_shims(spark)
    register_views(spark, sf_dir, ("nation",))
    return spark.sql(
        """
        SELECT n_nationkey,
               NULLIF(n_regionkey, 2) IS DISTINCT FROM 1      AS dist_from_one,
               NULLIF(n_regionkey, 2) IS NOT DISTINCT FROM
                 NULLIF(n_regionkey, 2)                       AS self_not_distinct,
               gcd(n_nationkey + 6L, 12L)                     AS gcd_12,
               lcm(n_nationkey + 1L, 4L)                      AS lcm_4,
               gcd(0L, 0L)                                    AS gcd_zero,
               substr_index(n_name, 'A', 2)                   AS before_2nd_a,
               CAST(length(uuid()) AS INT)                    AS uuid_len
        FROM nation
        ORDER BY n_nationkey
        """
    )


ORACLE_EDGE_NULL_SAFE_MISC = """
SELECT n_nationkey,
       NULLIF(n_regionkey, 2) IS DISTINCT FROM 1                        AS dist_from_one,
       NULLIF(n_regionkey, 2) IS NOT DISTINCT FROM NULLIF(n_regionkey, 2) AS self_not_distinct,
       gcd(n_nationkey + 6, 12)                                         AS gcd_12,
       lcm(n_nationkey + 1, 4)                                          AS lcm_4,
       gcd(0, 0)                                                        AS gcd_zero,
       array_to_string(string_split(n_name, 'A')[1:2], 'A')             AS before_2nd_a,
       CAST(length(CAST(uuid() AS VARCHAR)) AS INT)                     AS uuid_len
FROM nation
ORDER BY n_nationkey
"""
