"""Late-round-7 operator scale sweep: 10× the input, measure rows,
shuffle volume, and wall-clock one decade up — for the four new
operators (SemDeDup, contamination spans, BPE merges, BM25).

Same replica methodology as the dedup/curation sweeps: documents get
per-replica alphabet rotation (replicas are not near-dups of each
other), embeddings get a norm-preserving array rotation; id offsets
keep keys unique.

What each operator must show one decade up:

- ``sim_semdedup`` — run BOTH ways: n_cells FIXED at 16 (cells grow
  10×, within-cell pair work grows ~100× — the blowup the paper warns
  about) and n_cells SCALED 10× (bounded cell size — the configuration
  a real corpus runs, expected ~linear). The contrast is the evidence
  that the n_cells dial, not luck, bounds the quadratic term.
- ``contamination_spans`` — corpus 10×, benchmark FIXED: shuffle
  volume must stay ~CONSTANT (only the benchmark digest distinct
  shuffles; the corpus side is scan + broadcast probe), wall ~linear.
- ``bpe_merges`` — the corpus collapses to the word histogram in one
  shuffle; rotated replicas mint new surface forms so vocab grows
  ~10×, and superstep cost follows vocab, not corpus.
- ``bm25_rank`` — stats are ONE aggregate row; shuffle must stay
  ~constant, wall ~linear in the scan.

Usage: python tools/scale_sweep_r7ops.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pyspark.sql.functions as F  # noqa: E402

REPLICAS = 10
OUT_DOCS = "/tmp/scale_sweep_r7ops/documents.parquet"
OUT_EMB = "/tmp/scale_sweep_r7ops/embeddings.parquet"

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"


def get_ui_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.appName("scale-sweep-r7ops")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "true")  # stage-level shuffle metrics
        .getOrCreate()
    )


def build_10x(spark, sf_dir: str) -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source", "text")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "label", "embedding")
    dparts, eparts = [], []
    for r in range(REPLICAS):
        rot = lambda s, n: s[n:] + s[:n]  # noqa: E731
        src = LOWER + UPPER + DIGIT
        dst = rot(LOWER, r) + rot(UPPER, r) + rot(DIGIT, r)
        dparts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                "source",
                F.translate(F.col("text"), src, dst).alias("text"),
            )
        )
        rotated = F.concat(
            F.slice(F.col("embedding"), r + 1, 64 - r),
            F.slice(F.col("embedding"), 1, r),
        )
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                "label",
                rotated.alias("embedding"),
            )
        )
    dall, eall = dparts[0], eparts[0]
    for p in dparts[1:]:
        dall = dall.unionAll(p)
    for p in eparts[1:]:
        eall = eall.unionAll(p)
    dall.write.mode("overwrite").parquet(OUT_DOCS)
    eall.write.mode("overwrite").parquet(OUT_EMB)


def _shuffle_write(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        return sum(s.get("shuffleWriteBytes", 0) for s in json.load(r))


def _drain(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def measure(spark, df_fn) -> dict:
    rows = df_fn().count()
    s0 = _shuffle_write(spark)
    _drain(df_fn())
    shuffle_mb = (_shuffle_write(spark) - s0) / 1e6
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _drain(df_fn())
        samples.append(time.perf_counter() - t0)
    return {
        "rows": rows,
        "shuffle_mb": round(shuffle_mb, 2),
        "sec": round(statistics.median(samples), 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_ui_spark()
    from easydb_server_spark.operators.dedup import contamination_spans
    from easydb_server_spark.operators.similarity import semdedup
    from easydb_server_spark.operators.text import bm25_rank, bpe_merges

    build_10x(spark, sf_dir)

    docs1 = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source", "text")
    docs10 = spark.read.parquet(OUT_DOCS)
    emb1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb10 = spark.read.parquet(OUT_EMB)
    bench = docs1.where(F.col("source") == "src0")  # benchmark FIXED

    cases = {
        "semdedup_fixed_cells": (
            lambda: semdedup(emb1, "embedding", "vec_id", n_cells=16),
            lambda: semdedup(emb10, "embedding", "vec_id", n_cells=16),
        ),
        "semdedup_scaled_cells": (
            lambda: semdedup(emb1, "embedding", "vec_id", n_cells=16),
            lambda: semdedup(emb10, "embedding", "vec_id", n_cells=160),
        ),
        # r8: n_cells=None auto-sizes to ceil(rows/128) — must track the
        # scaled-cells line above without the caller setting the dial
        "semdedup_auto_cells": (
            lambda: semdedup(emb1, "embedding", "vec_id"),
            lambda: semdedup(emb10, "embedding", "vec_id"),
        ),
        "contamination_spans": (
            lambda: contamination_spans(
                docs1.where(F.col("source") != "src0"), bench, "text", "doc_id", n=3
            ),
            lambda: contamination_spans(
                docs10.where(F.col("source") != "src0"), bench, "text", "doc_id", n=3
            ),
        ),
        "bpe_merges(6)": (
            lambda: bpe_merges(docs1, "text", n_merges=6),
            lambda: bpe_merges(docs10, "text", n_merges=6),
        ),
        "bm25_top15": (
            lambda: bm25_rank(docs1, "text", "doc_id", ["customer", "join", "vector"], topk=15),
            lambda: bm25_rank(docs10, "text", "doc_id", ["customer", "join", "vector"], topk=15),
        ),
    }
    for name, (one_fn, ten_fn) in cases.items():
        one, ten = measure(spark, one_fn), measure(spark, ten_fn)
        print(f"\n{name}")
        print(f"{'':12} {'1x':>12} {'10x':>12} {'ratio':>8}")
        for key in ("rows", "shuffle_mb", "sec"):
            ratio = ten[key] / one[key] if one[key] else float("inf")
            print(f"{key:12} {one[key]:>12} {ten[key]:>12} {ratio:>8.2f}")


if __name__ == "__main__":
    main()
