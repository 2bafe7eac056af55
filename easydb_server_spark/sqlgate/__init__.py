"""SQL gateway: classification, table extraction, path-as-table rewrite.

The reference does this with sqlparser-rs AST walks
(`src/sql/parse.rs`); we use a purpose-built tokenizer (no external
SQL parser in this environment) that is strictly more complete than
the reference's extractor (which misses SELECT-list and HAVING
subqueries — SURVEY.md §2.A A11).
"""

from easydb_server_spark.sqlgate.parse import (  # noqa: F401
    SQLType,
    classify,
    extract_table_names,
    rewrite_path_tables,
    tokenize,
)
