"""IVFPQ recall on a CLUSTERED corpus vs the uniform-random one.

The r12 sweep (SCALE.md "IVFADC recall") measured the nprobe/m/k grid
on uniform-random vectors — PQ's documented worst case: residuals are
isotropic, so 8-16 codes per subspace capture almost nothing and
recall@5 tops out ~0.2. A real 100 TB embedding corpus is the
opposite shape: vectors concentrate around semantic clusters, the
coarse IVF layer absorbs the between-cluster variance, and the
residual PQ layer only has to code the (much smaller) within-cluster
spread. This tool generates a Gaussian-mixture corpus at the exact
conformance geometry (500×64, 16 queries, 8 IVF cells, recall@5),
reruns the same nprobe×m×k grid on BOTH corpora in one session, and
prints one JSON line — the SCALE.md evidence that the dial settings
derived from the uniform sweep are the floor, not the expectation.

Corpus construction (seeded, deterministic):
* ``n_centers`` cluster centers ~ N(0, I_64), scaled to unit norm
* members = center + N(0, sigma^2 I); sigma is the within-cluster
  spread dial (default 0.15 — tight semantic clusters; 0.5 ~ loose)
* queries are perturbed copies of held-out members (the realistic
  serving case: the query IS near some cluster)

Usage: python tools/scale_sweep_ivfpq_clustered.py [sigma ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_CORPUS = 500
N_QUERIES = 16
DIM = 64
N_CELLS = 8
K_TOP = 5
GRID = [(nprobe, m, k) for nprobe in (1, 2, 4) for m in (4, 8) for k in (8, 16)]


def _make_clustered(rng, sigma: float, n_centers: int = 8):
    centers = rng.normal(size=(n_centers, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_centers, size=N_CORPUS + N_QUERIES)
    pts = centers[labels] + rng.normal(scale=sigma, size=(N_CORPUS + N_QUERIES, DIM))
    return pts[:N_CORPUS], pts[N_CORPUS:]


def _make_uniform(rng):
    pts = rng.normal(size=(N_CORPUS + N_QUERIES, DIM))
    return pts[:N_CORPUS], pts[N_CORPUS:]


def _frames(spark, corpus_np, queries_np):
    crows = [(i, [float(v) for v in corpus_np[i]]) for i in range(len(corpus_np))]
    qrows = [(i, [float(v) for v in queries_np[i]]) for i in range(len(queries_np))]
    schema = "vec_id long, embedding array<double>"
    return spark.createDataFrame(crows, schema), spark.createDataFrame(qrows, schema)


def _sweep(spark, corpus_np, queries_np) -> dict:
    from easydb_server_spark.operators.pq import ivfpq_recall

    corpus, queries = _frames(spark, corpus_np, queries_np)
    out = {}
    for nprobe, m, k in GRID:
        t0 = time.perf_counter()
        rows = ivfpq_recall(
            corpus,
            queries,
            "embedding",
            "vec_id",
            k_top=K_TOP,
            m=m,
            k=k,
            n_cells=N_CELLS,
            nprobe=nprobe,
        ).collect()
        wall = round(time.perf_counter() - t0, 2)
        mean_recall = round(sum(r.recall for r in rows) / max(len(rows), 1), 4)
        out[f"nprobe{nprobe}_m{m}_k{k}"] = {"recall": mean_recall, "wall_s": wall}
    return out


def main() -> None:
    sigmas = [float(a) for a in sys.argv[1:]] or [0.15, 0.5]
    from easydb_server_spark import get_spark

    spark = get_spark("ivfpq-clustered-sweep")
    rng = np.random.default_rng(13)
    result = {"geometry": f"{N_CORPUS}x{DIM}, {N_QUERIES} queries, "
                          f"{N_CELLS} cells, recall@{K_TOP}"}
    cu, qu = _make_uniform(rng)
    result["uniform"] = _sweep(spark, cu, qu)
    for sigma in sigmas:
        cc, qc = _make_clustered(rng, sigma)
        result[f"clustered_sigma{sigma}"] = _sweep(spark, cc, qc)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
