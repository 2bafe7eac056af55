"""Export sinks: query result → CSV / TSV / NdJSON file (A16–A18).

Reference behavior (`src/controllers.rs:181-241`): uncapped result
written to ``/tmp/easydb/query-{yyyymmddhhmmss}{ms}.{ext}``, then
streamed back as a download.

Deviation (documented, SURVEY.md §7.4 quirk 1): the reference's TSV
export builds a tab-delimiter option but never passes it, producing
comma-delimited ``.tsv`` files — we actually emit tabs.

Scale note: the interactive server writes a single local file (pandas
path, matching the reference's single-node sink). For cluster-scale
exports use ``df.write.csv/json`` directly — the helper exposes
``distributed=True`` for that.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame

EXPORT_DIR = "/tmp/easydb"


def _export_path(ext: str) -> str:
    ts = time.strftime("%Y%m%d%H%M%S") + f"{int(time.time() * 1000) % 1000:03d}"
    os.makedirs(EXPORT_DIR, exist_ok=True)
    return os.path.join(EXPORT_DIR, f"query-{ts}.{ext}")


def export_query(df: DataFrame, fmt: str, distributed: bool = False) -> str:
    """Write the full (uncapped) result; returns the file path."""
    fmt = fmt.lower()
    if fmt not in ("csv", "tsv", "json", "ndjson"):
        from easydb_server_spark.errors import UnsupportedFormatError

        raise UnsupportedFormatError(f"Unsupported export format: {fmt!r}")
    ext = "json" if fmt == "ndjson" else fmt
    path = _export_path(ext)
    if distributed:
        # cluster path: many part-files, parallel writers
        if fmt == "csv":
            df.write.option("header", True).csv(path)
        elif fmt == "tsv":
            df.write.option("header", True).option("sep", "\t").csv(path)
        else:
            df.write.json(path)
        return path
    pdf = df.toPandas()
    if fmt == "csv":
        pdf.to_csv(path, index=False)
    elif fmt == "tsv":
        pdf.to_csv(path, index=False, sep="\t")
    else:  # NdJSON lines — DataFusion write_json parity (A18)
        pdf.to_json(path, orient="records", lines=True, date_format="iso")
    return path
