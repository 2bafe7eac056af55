"""xlsx reader: glob-expanded pandas loads → one Spark DataFrame.

Reference behavior (`src/data_source/excel.rs:11-101`):
- ``path#SheetName`` suffix selects a sheet; default first sheet;
- header = row 0; rows appended across all glob-matched workbooks;
- types from header-row cells (kept *deviation*: we use real pandas
  inference per SURVEY.md §7.4 recommendation, documented superset).

The default loader is the vendored stdlib-only OOXML decoder
(``sources/xlsx_codec.py`` — zipfile + xml.etree), so real workbooks
read with zero third-party engines, matching the reference's native
support. ``set_excel_loader`` remains the injection seam for tests or
an openpyxl/calamine-backed loader.

Scale note (SURVEY.md §7.4 risk 6): the per-file pandas load keeps the
reference's semantics; for many/huge workbooks the scale path is
``spark.read.format("binaryFile")`` + ``mapInPandas`` so each workbook
decodes on an executor. The loader indirection here is exactly that
seam — the same function body moves into the mapInPandas closure.
"""

from __future__ import annotations

import glob as _glob
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.errors import NotFoundError
from easydb_server_spark.sources.xlsx_codec import load_xlsx, load_xlsx_bytes

_loader: Callable[[str, str | int], pd.DataFrame] | None = None


def set_excel_loader(fn: Callable[[str, str | int], pd.DataFrame] | None) -> None:
    """Inject an xlsx→DataFrame loader (tests; or an openpyxl one).
    ``None`` restores the vendored stdlib decoder."""
    global _loader
    _loader = fn


def _default_loader(path: str, sheet: str | int) -> pd.DataFrame:
    return load_xlsx(path, sheet).infer_objects()


def read_xlsx(spark: SparkSession, resolved_path: str) -> DataFrame:
    """Read all glob-matched workbooks into one DataFrame."""
    path, sheet = resolved_path, 0
    if "#" in resolved_path:
        path, sheet_name = resolved_path.rsplit("#", 1)
        sheet = sheet_name
    files = sorted(_glob.glob(path))
    if not files:
        raise NotFoundError(f"No files match path: {path!r}")
    loader = _loader or _default_loader
    pdfs = [loader(f, sheet) for f in files]
    merged = pd.concat(pdfs, ignore_index=True)
    return spark.createDataFrame(merged)


def read_xlsx_distributed(spark: SparkSession, resolved_path: str, schema: str) -> DataFrame:
    """Scale path (SURVEY.md §7.4 risk 6): each workbook decodes on an
    executor via binaryFile + mapInPandas — no driver materialization,
    parallelism = number of workbooks.

    Requires an explicit result ``schema`` (the driver never opens a
    file, so nothing can be inferred). The loader is snapshotted by
    value into the closure: worker processes don't share driver module
    state.
    """
    from collections.abc import Iterator

    path, sheet = resolved_path, 0
    if "#" in resolved_path:
        path, sheet_name = resolved_path.rsplit("#", 1)
        sheet = sheet_name
    loader = _loader  # None → vendored stdlib decoder from bytes in the worker
    cols = [f.split()[0] for f in schema.split(",")]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                payload = bytes(row["content"])
                if loader is not None:
                    out = loader(row["path"], sheet)
                else:
                    out = load_xlsx_bytes(payload, sheet)
                yield out[cols]

    blobs = spark.read.format("binaryFile").load(path).select("path", "content")
    return blobs.mapInPandas(decode, schema)
