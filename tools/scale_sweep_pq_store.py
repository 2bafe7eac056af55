"""PQ store lifecycle at index scale: is compaction bounded by the
dirty slice, and does probe latency survive generations of appends?

The conformance entry (pq_store_lifecycle) grades SEMANTICS at sf0.01;
this sweep measures the two scale claims of the store design
(operators/pq.py store section):

1. **Compaction cost tracks the re-crawl footprint, not the store.**
   We grow the store 10x through append generations where only a
   small fixed slice is re-crawled, compact after each, and record
   bytes rewritten (file-listing diff) vs store bytes. Expected:
   rewritten bytes ~ the dirty buckets' share, NOT proportional to
   the store; a fresh-id-only generation rewrites ~nothing.
2. **Probe latency is flat in generation count after compaction.**
   Serving (pq_store_adc_topk) streams the codes table once with a
   broadcast LUT, so latency tracks store SIZE (rows), never how many
   append/compact cycles produced it; pre-compaction it also pays the
   superseded rows. We record serve wall-clock per generation.

Usage: python tools/scale_sweep_pq_store.py [n_generations]
Prints one JSON line (the SCALE.md evidence table).
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

DIM = 64
BASE = 2000
PER_GEN = 2000  # fresh ids appended per generation
RECRAWL = 4  # re-crawled ids on odd generations (even gens: fresh-only)
N_BUCKETS = 256  # production-shaped partition granularity: the bound
# "compaction ∝ dirty slice" is rewritten = dirty_buckets × bucket_size,
# so a deployment sizes the bucket count to keep bucket_size bounded
# (16, the sf0.01 conformance default, makes ANY 50+-id re-crawl dirty
# every bucket — the first run of this sweep measured rewrite_frac 1.0
# and taught exactly that sizing rule)
N_QUERIES = 8


def _vec_frame(spark, ids, rng):
    v = rng.normal(size=(len(ids), DIM))
    rows = [(int(i), [float(x) for x in v[j]]) for j, i in enumerate(ids)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _store_bytes(spark, tbl) -> dict[str, int]:
    """{file_path: size} for every data file of the store."""
    jvm = spark.sparkContext._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    root = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{tbl.lower()}")
    fs = root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out = {}
    if not fs.exists(root):
        return out
    it = fs.listFiles(root, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith("_"):
            out[str(f.getPath())] = int(f.getLen())
    return out


def main() -> None:
    n_gens = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from easydb_server_spark import get_spark
    from easydb_server_spark.operators import pq as PQ

    spark = get_spark("pq-store-sweep")
    rng = np.random.default_rng(29)
    tbl = "pq_store_sweep_t"

    base = _vec_frame(spark, range(BASE), rng)
    PQ.write_pq_store(base, "embedding", "vec_id", tbl, m=8, k=16, n_buckets=N_BUCKETS)
    queries = _vec_frame(spark, range(N_QUERIES), rng)
    # warm the serve path (LUT codegen, broadcast machinery)
    PQ.pq_store_adc_topk(spark, queries, "embedding", "vec_id", tbl, k_top=5).count()

    gens = []
    next_id = BASE
    for g in range(1, n_gens + 1):
        fresh_ids = list(range(next_id, next_id + PER_GEN))
        next_id += PER_GEN
        # odd generations re-crawl a tiny fixed slice; even ones are
        # fresh-only (compaction should then rewrite ~nothing)
        recrawl_ids = list(range(0, RECRAWL)) if g % 2 else []
        batch = _vec_frame(spark, fresh_ids + recrawl_ids, rng)
        PQ.append_to_pq_store(spark, batch, "embedding", "vec_id", tbl)

        before = _store_bytes(spark, tbl)
        t0 = time.perf_counter()
        kept = PQ.compact_pq_store(spark, tbl)
        compact_wall = round(time.perf_counter() - t0, 2)
        after = _store_bytes(spark, tbl)
        rewritten = sum(sz for p, sz in after.items() if p not in before)
        store_bytes = sum(after.values())

        t0 = time.perf_counter()
        PQ.pq_store_adc_topk(spark, queries, "embedding", "vec_id", tbl, k_top=5).count()
        serve_wall = round(time.perf_counter() - t0, 2)

        gens.append(
            {
                "gen": g,
                "recrawled": len(recrawl_ids),
                "rows": kept,
                "store_bytes": store_bytes,
                "bytes_rewritten": rewritten,
                "rewrite_frac": round(rewritten / max(store_bytes, 1), 4),
                "compact_s": compact_wall,
                "serve_s": serve_wall,
            }
        )
    print(json.dumps({"config": {"base": BASE, "per_gen": PER_GEN,
                                 "recrawl": RECRAWL, "dim": DIM, "m": 8, "k": 16},
                      "generations": gens}))


if __name__ == "__main__":
    main()
