"""Production-layout ingest CLI — one story for the two storage-layout
tools (tools/relayout.py: multi-row-group files; tools/bucketize.py:
measured zero-exchange bucketed joins), wired into the engine.

Lands a source file/glob (any gateway-readable format: csv/tsv/ndjson/
xlsx/parquet/orc) as a managed table, bucketed+sorted on a key via
``Engine.ingest_bucketed``. Every later gateway equi-join/groupBy on
that key across co-bucketed tables is exchange-free (plan-locked by
tests/test_ingest_bucketed.py; bytes measured by tools/bucketize.py).

Usage:
  python tools/ingest.py <source_path> <table_name> <bucket_col> [n_buckets]

Prints one JSON line with the landed table's location and bucket spec.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    source, name, bucket_col = sys.argv[1:4]
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    from pyspark.sql import SparkSession

    from easydb_server_spark.engine import Engine

    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    eng = Engine(spark)
    out = eng.ingest_bucketed(name, source, bucket_col, n_buckets=n_buckets)
    loc = [t for t in eng.catalog.list_tables() if t["table_ref"] == name][-1]["table_path"]
    print(json.dumps({"table": name, "location": loc, **{k: out[k] for k in ("bucketed_by", "n_buckets")}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
