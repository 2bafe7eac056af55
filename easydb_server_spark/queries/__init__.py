"""Conformance query registry.

Maps every implemented operator from SURVEY.md §2 to a
(Spark callable, DuckDB oracle SQL) pair. The driver runs both at
sf0.01 and compares row-count + schema + order-insensitive value hash
(`__spark_entry__.py` contract). Oracle ``None`` → rows-only check
(used only for ops whose results are implementation-defined, e.g. HLL
sketches).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.queries import aggregates as agg
from easydb_server_spark.queries import joins

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql_or_None)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    # --- aggregations ---
    "agg_pricing_summary": (agg.q_agg_pricing_summary, agg.ORACLE_PRICING_SUMMARY),
    "agg_count_distinct": (agg.q_agg_count_distinct, agg.ORACLE_COUNT_DISTINCT),
    "agg_stats": (agg.q_agg_stats, agg.ORACLE_STATS),
    "agg_minmax_by": (agg.q_agg_minmax_by, agg.ORACLE_MINMAX_BY),
    "agg_string_agg": (agg.q_agg_string_agg, agg.ORACLE_STRING_AGG),
    "agg_filter_clause": (agg.q_agg_filter_clause, agg.ORACLE_FILTER_CLAUSE),
    "agg_rollup": (agg.q_agg_rollup, agg.ORACLE_ROLLUP),
    "agg_cube": (agg.q_agg_cube, agg.ORACLE_CUBE),
    "agg_grouping_sets": (agg.q_agg_grouping_sets, agg.ORACLE_GROUPING_SETS),
    "agg_having": (agg.q_agg_having, agg.ORACLE_HAVING),
    "agg_percentiles": (agg.q_agg_percentiles, agg.ORACLE_PERCENTILES),
    "agg_bool_bit": (agg.q_agg_bool_bit, agg.ORACLE_BOOL_BIT),
    "agg_approx_distinct": (agg.q_agg_approx_distinct, None),
    # --- joins ---
    "join_inner_revenue": (joins.q_join_inner_revenue, joins.ORACLE_INNER_REVENUE),
    "join_left_outer": (joins.q_join_left_outer, joins.ORACLE_LEFT_OUTER),
    "join_right_outer": (joins.q_join_right_outer, joins.ORACLE_RIGHT_OUTER),
    "join_full_outer": (joins.q_join_full_outer, joins.ORACLE_FULL_OUTER),
    "join_semi": (joins.q_join_semi, joins.ORACLE_SEMI),
    "join_anti": (joins.q_join_anti, joins.ORACLE_ANTI),
    "join_cross": (joins.q_join_cross, joins.ORACLE_CROSS),
    "join_nonequi": (joins.q_join_nonequi, joins.ORACLE_NONEQUI),
    "join_using": (joins.q_join_using, joins.ORACLE_USING),
}


def spark_queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _oracle) in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {name: oracle for name, (_fn, oracle) in REGISTRY.items() if oracle is not None}
