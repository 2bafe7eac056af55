"""Dedup/LSH scale sweep: 10× the corpus, measure candidates + time.

Builds a 10× replica of sf0.1's documents table (doc_ids offset per
replica; text passed through a per-replica alphabet rotation so
replicas are NOT near-duplicates of each other — cross-replica shingle
overlap ≈ 0, modeling a corpus 10× larger with the same internal
duplicate structure, not a corpus that is 90% copies), then runs the
flagship MinHash-LSH pipeline at 1× and 10× and reports:

- |docs|, |LSH candidate pairs|, |verified pairs ≥ threshold|
- wall-clock (median of 3 warm runs, noop drain)

The number that must stay near-linear is |candidates|: LSH banding
confines the quadratic blowup to same-bucket collisions, so 10× docs
should give ~10× candidates (each replica contributes the original's
collision structure), never ~100×.

Usage: python tools/scale_sweep_dedup.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pyspark.sql.functions as F  # noqa: E402

from easydb_server_spark import get_spark  # noqa: E402
from easydb_server_spark.operators import dedup as D  # noqa: E402

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"
REPLICAS = 10
OUT = "/tmp/scale_sweep_docs/documents.parquet"


def build_10x(spark, sf_dir: str) -> None:
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    parts = []
    for r in range(REPLICAS):
        rot = lambda s, n: s[n:] + s[:n]  # noqa: E731
        src = LOWER + UPPER + DIGIT
        dst = rot(LOWER, r) + rot(UPPER, r) + rot(DIGIT, r)
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                F.translate(F.col("text"), src, dst).alias("text"),
            )
        )
    tenx = parts[0]
    for p in parts[1:]:
        tenx = tenx.unionAll(p)
    tenx.write.mode("overwrite").parquet(OUT)


def measure(spark, docs) -> dict:
    n_docs = docs.count()
    n_cand = D.minhash_candidates(docs, "text", "doc_id").count()
    pairs = D.minhash_pairs(docs, "text", "doc_id", threshold=0.5)
    n_pairs = pairs.count()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        try:
            pairs.write.format("noop").mode("overwrite").save()
        except Exception:
            pairs.count()
        samples.append(time.perf_counter() - t0)
    return {
        "docs": n_docs,
        "candidates": n_cand,
        "pairs": n_pairs,
        "sec": round(statistics.median(samples), 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-sweep-dedup")
    build_10x(spark, sf_dir)

    one = measure(spark, spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text"))
    ten = measure(spark, spark.read.parquet(OUT))

    print(f"{'':12} {'1x':>12} {'10x':>12} {'ratio':>8}")
    for key in ("docs", "candidates", "pairs", "sec"):
        ratio = ten[key] / one[key] if one[key] else float("inf")
        print(f"{key:12} {one[key]:>12} {ten[key]:>12} {ratio:>8.2f}")


if __name__ == "__main__":
    main()
