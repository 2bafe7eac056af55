"""Recall sweep for the incremental embedding near-dup probe.

IVF probing is approximate: a near-dup pair straddling a cell
boundary is invisible below the nprobe that reaches its twin's cell.
This tool measures that recall against the brute-force ground truth
at sf0.1 — the evidence behind SCALE.md's claim that the probe's
recall dial behaves like serving's.

Method: corpus = the even vec_ids (store side), batch = 200 synthetic
near-copies of corpus vectors (one coordinate perturbed by ``eps``) so
ground truth is known BY CONSTRUCTION (each batch vector's true match
is its source). Recall@nprobe = found true matches / 200, for nprobe
in {1, 2, 4}; threshold 0.95.

Usage: python tools/scale_sweep_embprobe.py [sf_dir]   # one JSON line
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

N_BATCH = 200
EPS = 0.15
THRESHOLD = 0.95


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import pyspark.sql.functions as F

    from easydb_server_spark import get_spark
    from easydb_server_spark.operators.similarity import (
        _as_double,
        _assign_cells,
        embedding_neardup_probe,
        ivf_centroids,
    )

    spark = get_spark("embprobe-sweep")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = _as_double(F.col("embedding"))
    corpus = e.where(F.col("vec_id") % 2 == 0).select("vec_id", emb.alias("vec"))
    n_corpus = corpus.count()
    # batch: near-copies of the first N_BATCH corpus vectors
    batch = (
        corpus.orderBy("vec_id")
        .limit(N_BATCH)
        .select(
            (F.col("vec_id") + 1_000_000).alias("qid"),
            F.concat(
                F.array(F.element_at(F.col("vec"), 1) + F.lit(EPS)),
                F.slice(F.col("vec"), 2, 63),
            ).alias("qvec"),
        )
    ).localCheckpoint(eager=True)

    cents = ivf_centroids(corpus, "vec", "vec_id", n_cells=None)
    store = _assign_cells(
        corpus.select(F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")), cents
    ).localCheckpoint(eager=True)

    # ground truth: each near-copy's source, when the perturbed cosine
    # still clears the threshold (brute-force over the known pairs)
    truth = (
        batch.join(
            corpus.select((F.col("vec_id") + 1_000_000).alias("qid"), F.col("vec").alias("cvec")),
            "qid",
        )
        .select(
            "qid",
            (F.col("qid") - 1_000_000).alias("cid"),
            F.round(
                F.aggregate(
                    F.zip_with(F.col("qvec"), F.col("cvec"), lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (
                    F.sqrt(F.aggregate(F.transform(F.col("qvec"), lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
                    * F.sqrt(F.aggregate(F.transform(F.col("cvec"), lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
                ),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= THRESHOLD)
    )
    true_pairs = {(r.qid, r.cid) for r in truth.collect()}

    recalls = {}
    for nprobe in (1, 2, 4):
        got = embedding_neardup_probe(store, cents, batch, THRESHOLD, nprobe)
        found = {(r.batch_id, r.corpus_id) for r in got.collect()}
        hit = len(true_pairs & found)
        recalls[f"nprobe_{nprobe}"] = round(hit / max(len(true_pairs), 1), 4)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_corpus": n_corpus,
                "n_batch": N_BATCH,
                "eps": EPS,
                "threshold": THRESHOLD,
                "n_true_pairs": len(true_pairs),
                "n_cells": cents.count(),
                "recall": recalls,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
