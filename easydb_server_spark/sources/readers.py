"""Spark readers per format + temp-view registration.

Reference parity (SURVEY.md §2.A A1–A8):

- CSV/TSV: header row + schema inference (DataFusion default
  ``CsvReadOptions`` ⇔ Spark header/inferSchema options).
- NdJSON (``.log``/``.txt``): Spark's native JSON reader *is* NDJSON.
- ``.json`` whole-file: rejected for parity (A4) even though Spark's
  multiLine reader could handle it.
- xlsx: out-of-engine load (pandas) → ``createDataFrame`` — mirroring
  the reference's own out-of-engine calamine loader
  (`src/data_source/excel.rs:11-101`). Gated behind an import-try
  (openpyxl is not in this container).
- Parquet: documented superset.

Globs are native to Spark's DataFrameReader for CSV/JSON/Parquet
(A1–A3, A7); xlsx expands with ``glob.glob`` like the reference's
``find_files`` (`src/data_source/utils.rs:28-38`).

Scale note: CSV/NdJSON listing + schema inference is a distributed
scan; inferred schemas are cached per (path, mtime) so re-registration
per request (the reference's fresh-session semantics) doesn't re-scan
— the optimization the reference's roadmap asks for (SURVEY.md §7.4).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.errors import NotFoundError, UnsupportedFormatError
from easydb_server_spark.sources.formats import DataSourceFormat, get_format

DEFAULT_DATA_DIR = "/var/lib/easydb"

# (resolved_path, fmt) -> (mtime_signature, StructType); one entry per
# source so a changed signature evicts the stale schema instead of
# accumulating keys forever in a long-lived server
_SCHEMA_CACHE: dict[tuple[str, str], tuple[tuple, object]] = {}


def data_dir() -> str:
    return os.environ.get("DATA_DIR", DEFAULT_DATA_DIR)


def resolve_path(path: str) -> str:
    """Relative paths resolve against DATA_DIR
    (`src/data_source/context.rs:30-44`, `src/utils.rs:24-30`)."""
    if os.path.isabs(path):
        return path
    return os.path.join(data_dir(), path)


def _mtime_signature(resolved: str) -> tuple:
    """Change signature over the FULL glob listing: file count plus an
    order-sensitive digest of every (name, mtime, size). Constant-size
    key — a 10⁵-file glob costs one stat pass but no giant tuple — and
    ANY difference in membership, order, mtime, or size invalidates
    (an aggregate like (count, max mtime, total bytes) would miss a
    same-size rename that preserves mtimes)."""
    import hashlib

    files = sorted(_glob.glob(resolved)) or [resolved]
    h = hashlib.md5()
    for f in files:
        try:
            st = os.stat(f)
            h.update(f"{f}\x00{st.st_mtime_ns}\x00{st.st_size}\x1e".encode())
        except OSError:
            h.update(f"{f}\x00missing\x1e".encode())
    return (len(files), h.hexdigest())


def _cached_schema(resolved: str, fmt: str, sig: tuple):
    hit = _SCHEMA_CACHE.get((resolved, fmt))
    if hit is not None and hit[0] == sig:
        return hit[1]
    return None


def read_path(spark: SparkSession, path: str) -> DataFrame:
    """Read a file/glob path into a DataFrame, routing by extension."""
    fmt = get_format(path)
    resolved = resolve_path(path)
    if not _glob.glob(resolved) and not os.path.exists(resolved):
        raise NotFoundError(f"No files match path: {path!r}")
    if fmt == DataSourceFormat.JSON:
        raise UnsupportedFormatError("JSON files are currently not supported.")
    if fmt == DataSourceFormat.XLSX:
        from easydb_server_spark.sources.excel import read_xlsx

        return read_xlsx(spark, resolved)

    sig = _mtime_signature(resolved)
    cached_schema = _cached_schema(resolved, fmt.value, sig)

    if fmt == DataSourceFormat.CSV or fmt == DataSourceFormat.TSV:
        reader = spark.read.option("header", True)
        if fmt == DataSourceFormat.TSV:
            reader = reader.option("sep", "\t")
        if cached_schema is not None:
            df = reader.schema(cached_schema).csv(resolved)
        else:
            df = reader.option("inferSchema", True).csv(resolved)
            _SCHEMA_CACHE[(resolved, fmt.value)] = (sig, df.schema)
        return df
    if fmt == DataSourceFormat.NDJSON:
        if cached_schema is not None:
            return spark.read.schema(cached_schema).json(resolved)
        df = spark.read.json(resolved)
        _SCHEMA_CACHE[(resolved, fmt.value)] = (sig, df.schema)
        return df
    if fmt == DataSourceFormat.PARQUET:
        return spark.read.parquet(resolved)
    if fmt == DataSourceFormat.ORC:
        return spark.read.orc(resolved)
    raise UnsupportedFormatError(f"Unsupported file format: {path!r}")


def register_path(spark: SparkSession, name: str, path: str) -> DataFrame:
    """read_path + temp-view registration (A1–A3 registration ⇔
    ``createOrReplaceTempView``)."""
    df = read_path(spark, path)
    df.createOrReplaceTempView(name)
    return df
