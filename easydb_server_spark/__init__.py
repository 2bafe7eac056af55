"""easydb_server_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference `shencangsheng/easydb_server` (a web SQL assistant that
treats loose text files — CSV/TSV/NdJSON/xlsx — as a queryable
database, delegating SQL execution to Apache DataFusion), re-expressed
Spark-first:

- All relational execution is Spark SQL / DataFrame API; Catalyst and
  AQE do the optimizing (SURVEY.md §4 — zero custom rules needed).
- The reference's own ~1.3 kLoC of gateway behavior (format routing,
  path-as-table rewrite, catalog, implicit LIMIT, stringified results,
  export sinks, history) live in :mod:`easydb_server_spark.engine`
  and friends.
- Beyond-parity large-scale data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) live in
  :mod:`easydb_server_spark.operators`.
"""

__version__ = "0.1.0"

from easydb_server_spark.session import get_spark  # noqa: F401
