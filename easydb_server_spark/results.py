"""Result materialization + stringification (A15).

Reference behavior (`src/controllers.rs:34-86`): headers from the
schema; every cell rendered to a string (Arrow ``ArrayFormatter``),
nulls as the string ``"null"`` (`src/controllers.rs:48`); row-major
``{header, rows}``. One centralized formatter here, locked by unit
tests (SURVEY.md §7.4 risk 2).
"""

from __future__ import annotations

import datetime
import decimal
import math

from pyspark.sql import DataFrame

NULL_STR = "null"
INTERACTIVE_LIMIT = 200  # implicit cap (A13, `src/controllers.rs:31`)


def format_cell(v) -> str:
    if v is None:
        return NULL_STR
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e16:
            return f"{v:.1f}"  # arrow renders float 3 as "3.0"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ", ".join(format_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {format_cell(x)}" for k, x in v.items()) + "}"
    return str(v)


def materialize(df: DataFrame, limit: int | None = INTERACTIVE_LIMIT) -> dict:
    """collect (capped) → {header, rows} of strings."""
    if limit is not None:
        df = df.limit(limit)
    rows = df.collect()
    header = df.columns
    return {
        "header": header,
        "rows": [[format_cell(v) for v in row] for row in rows],
    }
