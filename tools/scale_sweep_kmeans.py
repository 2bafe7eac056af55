"""Scaling sweep for the exact-INT64 Lloyd k-means (operators/kmeans.py).

The 100 TB claim under test: per iteration, the assignment is a
map-only broadcast pass and the update shuffles only
map-side-combined (cluster, dim) partials — so total wall time should
scale ~linearly in corpus size at fixed (k, d, iters), with NO
super-linear term from the shuffle (the exchanged volume is
partitions x k x d, independent of n).

Method: corpus = the sf embeddings unioned with id-shifted copies
(1x, 4x, 10x; geometry duplication is fine — Lloyd cost is
independent of where points sit), k=8, iters=2, timed end-to-end
(seeding + 2 updates + final assignment drain). At the 10x size the
result is also recomputed under a different input partitioning and
compared — the INT64 discipline's bit-identical claim at sweep scale.

Usage: python tools/scale_sweep_kmeans.py [sf_dir]   # one JSON line
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

COPIES = (1, 4, 10)
K = 8
ITERS = 2


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import pyspark.sql.functions as F

    from easydb_server_spark import get_spark
    from easydb_server_spark.operators.kmeans import kmeans_assign

    spark = get_spark("kmeans-sweep")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    n_base = base.count()

    def corpus(copies: int):
        parts = [
            base.select((F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"), "embedding")
            for i in range(copies)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    rows = []
    for c in COPIES:
        df = corpus(c)
        # warm pass: file listing, codegen, broadcast machinery
        kmeans_assign(df, "embedding", "vec_id", k=K, iters=ITERS).count()
        t0 = time.perf_counter()
        n_out = kmeans_assign(df, "embedding", "vec_id", k=K, iters=ITERS).count()
        dt = time.perf_counter() - t0
        rows.append({"copies": c, "n": n_base * c, "rows_out": n_out, "sec": round(dt, 2)})

    # bit-identical under repartitioning at the largest size
    big = corpus(COPIES[-1])
    a = kmeans_assign(big.repartition(4), "embedding", "vec_id", k=K, iters=ITERS)
    b = kmeans_assign(big.repartition(64), "embedding", "vec_id", k=K, iters=ITERS)
    mismatches = (
        a.alias("a")
        .join(b.alias("b"), "pid", "full")
        .where(
            (F.col("a.cluster") != F.col("b.cluster"))
            | (F.col("a.dist2") != F.col("b.dist2"))
        )
        .count()
    )

    base_rate = rows[0]["sec"] / rows[0]["n"]
    top_rate = rows[-1]["sec"] / rows[-1]["n"]
    print(
        json.dumps(
            {
                "sweep": "kmeans-lloyd",
                "k": K,
                "iters": ITERS,
                "points": rows,
                "sec_per_1k_at_1x": round(1000 * base_rate, 4),
                "sec_per_1k_at_10x": round(1000 * top_rate, 4),
                # <1: per-row cost FELL with scale (fixed overhead
                # amortized); ~1: linear; >>1: a super-linear term
                "rate_ratio_10x_vs_1x": round(top_rate / base_rate, 2),
                "repartition_mismatches_at_10x": mismatches,
            },
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
