"""Does the exact re-rank stage actually buy recall? (ivfpq_rerank)

Measures recall@5 against the exact ranking (the same ground truth
`ivfpq_recall` uses) for: ADC-only top-5, and ivfpq_rerank with
candidate budgets 8 / 16 / 32, at the conformance index geometry
(m=4, k=8, 8 cells, nprobe=2). The re-rank can only fix WITHIN-slice
ordering errors — candidates the probe never saw stay lost — so the
budget dial shows how much of ADC's error is ordering (recoverable)
vs pruning (not).

Usage: python tools/scale_sweep_rerank.py [sf_dir]   # one JSON line
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

K_TOP = 5
BUDGETS = (8, 16, 32)
GEOM = dict(m=4, k=8, n_cells=8, nprobe=2)


def _corpora(spark, sf_dir):
    """(name, corpus_df, queries_df) triples: the sf fixture
    (uniform-ish — PQ's documented worst case) and a Gaussian-mixture
    corpus at the clustered sweep's geometry (8 unit-norm centers,
    sigma=0.15 — the realistic serving shape). Query ids are shifted
    out of the corpus id space so exclude_self never bites a real
    corpus row."""
    import numpy as np
    import pyspark.sql.functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    fixture_q = e.where(F.col("vec_id") % 125 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    yield "fixture_uniform", e, fixture_q

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(8, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 8, size=516)
    pts = centers[labels] + rng.normal(scale=0.15, size=(516, 64))
    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(
        [(i, [float(v) for v in pts[i]]) for i in range(500)], schema
    )
    queries = spark.createDataFrame(
        [(100000 + i, [float(v) for v in pts[500 + i]]) for i in range(16)], schema
    )
    yield "clustered_sigma0.15", corpus, queries


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from easydb_server_spark import get_spark
    from easydb_server_spark.operators.pq import ivfpq_adc_topk, ivfpq_rerank
    from easydb_server_spark.operators.similarity import topk_cosine_bruteforce

    spark = get_spark("rerank-sweep")
    out = {"sweep": "ivfpq-rerank-recall", "k_top": K_TOP, "geometry": GEOM}
    for name, e, q in _corpora(spark, sf_dir):
        n_q = q.count()
        exact = topk_cosine_bruteforce(e, q, "embedding", "vec_id", K_TOP)

        def recall(approx) -> float:
            hits = exact.join(
                approx.select("qid", "cid"), ["qid", "cid"], "leftsemi"
            ).count()
            return round(hits / (n_q * K_TOP), 3)

        res = {
            "n_queries": n_q,
            "adc_only": recall(
                ivfpq_adc_topk(e, q, "embedding", "vec_id", k_top=K_TOP, **GEOM)
            ),
        }
        for b in BUDGETS:
            res[f"rerank_c{b}"] = recall(
                ivfpq_rerank(
                    e, q, "embedding", "vec_id", k_candidates=b, k_top=K_TOP, **GEOM
                )
            )
        out[name] = res
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
