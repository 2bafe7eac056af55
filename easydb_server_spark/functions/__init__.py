"""Dialect shims: DataFusion function names → Spark equivalents."""

from easydb_server_spark.functions.shims import register_dialect_shims  # noqa: F401
