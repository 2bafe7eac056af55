"""The 2-D (nprobe x rerank_c) recall grid on clustered data.

The r13 rerank sweep fixed nprobe=2 and swept the candidate budget;
its conclusion ("pair small nprobe with rerank_c~32") conflated the
two error sources. This grid separates them on the realistic serving
shape (Gaussian mixture, 8 unit-norm centers, sigma=0.15 — the same
corpus as scale_sweep_rerank.py): PRUNING error (the probe never
visits the true neighbor's cell) only nprobe can fix; WITHIN-SLICE
ORDERING error (ADC's quantized scores misrank visited candidates)
only the exact re-rank can fix. The crossover — where adding probes
stops beating adding re-rank budget — is the operational dial.

Usage: python tools/scale_sweep_rerank_grid.py [sf_dir]  # one JSON line
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

K_TOP = 5
NPROBES = (1, 2, 4, 8)
BUDGETS = (0, 8, 16, 32)  # 0 = ADC-only, no re-rank
GEOM = dict(m=4, k=8, n_cells=8)


def _clustered(spark):
    import numpy as np

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
    return corpus, queries


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    del sf_dir  # corpus is synthetic; arg kept for CLI symmetry

    from easydb_server_spark import get_spark
    from easydb_server_spark.operators.pq import ivfpq_adc_topk, ivfpq_rerank
    from easydb_server_spark.operators.similarity import topk_cosine_bruteforce

    spark = get_spark("rerank-grid")
    corpus, queries = _clustered(spark)
    n_q = queries.count()
    exact = topk_cosine_bruteforce(corpus, queries, "embedding", "vec_id", K_TOP)

    def recall(approx) -> float:
        hits = exact.join(approx.select("qid", "cid"), ["qid", "cid"], "leftsemi").count()
        return round(hits / (n_q * K_TOP), 3)

    grid = {}
    for nprobe in NPROBES:
        row = {}
        for b in BUDGETS:
            if b == 0:
                approx = ivfpq_adc_topk(
                    corpus, queries, "embedding", "vec_id", k_top=K_TOP, nprobe=nprobe, **GEOM
                )
            else:
                approx = ivfpq_rerank(
                    corpus, queries, "embedding", "vec_id",
                    k_candidates=b, k_top=K_TOP, nprobe=nprobe, **GEOM,
                )
            row[f"c{b}"] = recall(approx)
        grid[f"nprobe{nprobe}"] = row
    print(
        json.dumps(
            {
                "sweep": "ivfpq-rerank-grid",
                "corpus": "clustered_sigma0.15",
                "k_top": K_TOP,
                "geometry": GEOM,
                "grid": grid,
            },
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
