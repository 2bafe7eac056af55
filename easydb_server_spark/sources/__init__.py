"""Data sources: extension-based format routing and Spark readers."""

from easydb_server_spark.sources.formats import DataSourceFormat, get_format  # noqa: F401
from easydb_server_spark.sources.readers import read_path, register_path  # noqa: F401
