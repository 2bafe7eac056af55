"""DataFusion→Spark SQL dialect shims (SURVEY.md §7.3/§7.4 risk 1).

The reference exposes DataFusion 47's SQL dialect; Spark SQL differs
in a handful of function names. Rather than rewriting query text, we
register tiny SQL (lambda) functions so DataFusion spellings work
verbatim inside ``spark.sql``. Everything stays JVM-side — these are
``CREATE TEMPORARY FUNCTION name AS`` SQL-expression macros, not
Python UDFs, so codegen is unaffected.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# DataFusion name -> (args, Spark SQL body)
_SHIMS: dict[str, tuple[str, str]] = {
    "strpos": ("s STRING, sub STRING", "instr(s, sub)"),
    "to_char": ("d TIMESTAMP, fmt STRING", "date_format(d, fmt)"),
    "to_unixtime": ("d TIMESTAMP", "unix_timestamp(d)"),
    "arrow_typeof": ("x STRING", "typeof(x)"),
    "array_length": ("a ARRAY<BIGINT>", "size(a)"),
    "list_length": ("a ARRAY<BIGINT>", "size(a)"),
    "array_to_string": ("a ARRAY<STRING>, sep STRING", "array_join(a, sep)"),
    "regexp_like": ("s STRING, p STRING", "s RLIKE p"),
    "approx_distinct": ("x STRING", "approx_count_distinct(x)"),
    "approx_median": ("x DOUBLE", "percentile_approx(x, 0.5)"),
    "nvl2": ("a STRING, b STRING, c STRING", "CASE WHEN a IS NOT NULL THEN b ELSE c END"),
    "date_bin": (
        "stride_seconds BIGINT, ts TIMESTAMP, origin TIMESTAMP",
        "timestamp_micros(CAST(floor((unix_micros(ts) - unix_micros(origin)) / (stride_seconds * 1000000)) AS BIGINT)"
        " * stride_seconds * 1000000 + unix_micros(origin))",
    ),
}


def register_dialect_shims(spark: SparkSession) -> list[str]:
    """Register all shims as SQL macros; returns the registered names.

    Uses Spark SQL's ``CREATE OR REPLACE TEMPORARY FUNCTION`` via SQL
    lambda (``CREATE FUNCTION ... RETURN expr``) — a pure Catalyst
    expression, inlined at plan time.
    """
    registered = []
    for name, (args, body) in _SHIMS.items():
        try:
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) RETURNS "
                f"{_infer_ret(body)} RETURN {body}"
            )
            registered.append(name)
        except Exception:
            # a Spark build without SQL-function support, or the name
            # already exists as a builtin — both fine to skip
            pass
    return registered


def _infer_ret(body: str) -> str:
    if body.startswith(("instr", "unix_timestamp", "size")):
        return "BIGINT" if not body.startswith(("instr", "size")) else "INT"
    if body.startswith(("date_format", "array_join", "typeof")):
        return "STRING"
    if body.startswith("timestamp_micros"):
        return "TIMESTAMP"
    if body.startswith("percentile_approx"):
        return "DOUBLE"
    if body.startswith("approx_count_distinct"):
        return "BIGINT"
    if body.startswith("CASE"):
        return "STRING"
    if "RLIKE" in body:
        return "BOOLEAN"
    return "STRING"
