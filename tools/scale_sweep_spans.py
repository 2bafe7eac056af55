"""Duplicate-ngram-span scale sweep: 10× the corpus, measure flagged
spans + time.

Same replica methodology as tools/scale_sweep_dedup.py: 10 copies of
sf0.1's documents with a per-replica alphabet rotation, so replicas
share NO grams with each other — a corpus 10× larger with the same
internal duplicate-span structure. The numbers that must stay
near-linear are |distinct grams| and |flagged spans|: each replica
contributes the original's duplication structure, so 10× docs should
give ~10× flagged spans (never ~100×, which would indicate the
doc-frequency join degenerating into cross-replica pair work).

Usage: python tools/scale_sweep_spans.py [sf_dir]
Prints one JSON line with both measurements.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from easydb_server_spark import get_spark  # noqa: E402
from easydb_server_spark.operators import dedup as D  # noqa: E402
from tools.scale_sweep_dedup import OUT, build_10x  # noqa: E402


def measure(spark, docs) -> dict:
    spans = D.duplicate_ngram_spans(docs, "text", "doc_id", n=5, min_docs=2)
    n_docs = docs.count()
    n_flagged = spans.count()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        try:
            spans.write.format("noop").mode("overwrite").save()
        except Exception:
            spans.count()
        samples.append(time.perf_counter() - t0)
    return {
        "docs": n_docs,
        "flagged_spans": n_flagged,
        "sec": round(statistics.median(samples), 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-sweep-spans")
    build_10x(spark, sf_dir)
    one = measure(spark, spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text"))
    ten = measure(spark, spark.read.parquet(OUT))
    print(
        json.dumps(
            {
                "1x": one,
                "10x": ten,
                "span_growth": round(ten["flagged_spans"] / max(one["flagged_spans"], 1), 2),
                "time_growth": round(ten["sec"] / max(one["sec"], 0.01), 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main() or 0)
