"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()``
exposes one callable per implemented operator from SURVEY.md §2 and
``oracle_sql()`` the matching DuckDB SQL. See
``easydb_server_spark/queries/`` for the implementations.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# allow import regardless of the driver's CWD
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from easydb_server_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: multi-way broadcast
    join + two-phase hash aggregation (revenue by nation)."""
    from easydb_server_spark.queries.joins import q_join_inner_revenue

    return q_join_inner_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted for
    ops whose outputs are implementation-defined, e.g. HLL sketches)."""
    return _q.oracle_queries()
