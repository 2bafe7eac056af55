"""Curation-operator scale sweep: 10× the input, measure wall-clock
AND shuffle volume one decade up — for the two most expensive r5
operators, `text_repetition` (repetition_metrics) and
`emb_label_outliers` (label_outliers).

Inputs are replicated 10× the same way the dedup sweep does it
(tools/scale_sweep_dedup.py): documents get per-replica alphabet
rotation (replicas are not near-dups of each other), embeddings get a
per-replica array rotation (norm-preserving, keeps per-label
structure so centroid geometry is comparable, without 10 exact copies
of every vector). Offsets keep ids unique.

Both operators should scale ~linearly: repetition_metrics shuffles
(doc, gram) partials whose count is linear in token volume;
label_outliers shuffles one row per vector on the label key (the
per-label sort inside each window grows n·log n, but n here is rows
per label, and the approx-quantile `exact=False` path removes even
that at corpus scale). Superlinear wall-clock or shuffle growth here
would flag a hidden all-pairs/global-sort stage.

Usage: python tools/scale_sweep_curation.py [sf_dir]
Prints one table per operator (1x vs 10x: rows, shuffle MB, sec).
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
OUT_DOCS = "/tmp/scale_sweep_curation/documents.parquet"
OUT_EMB = "/tmp/scale_sweep_curation/embeddings.parquet"

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"


def get_ui_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.appName("scale-sweep-curation")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "true")  # stage-level shuffle metrics
        .getOrCreate()
    )


def build_10x(spark, sf_dir: str) -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "label", "embedding")
    dparts, eparts = [], []
    for r in range(REPLICAS):
        rot = lambda s, n: s[n:] + s[:n]  # noqa: E731
        src = LOWER + UPPER + DIGIT
        dst = rot(LOWER, r) + rot(UPPER, r) + rot(DIGIT, r)
        dparts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                F.translate(F.col("text"), src, dst).alias("text"),
            )
        )
        # norm-preserving array rotation: element i ← element (i+r) mod dim
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


def measure(spark, df_fn) -> dict:
    rows = df_fn().count()
    s0 = _shuffle_write(spark)
    df_fn().write.format("noop").mode("overwrite").save()
    shuffle_mb = (_shuffle_write(spark) - s0) / 1e6
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return {"rows": rows, "shuffle_mb": round(shuffle_mb, 2), "sec": round(statistics.median(samples), 2)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_ui_spark()
    from easydb_server_spark.operators.similarity import label_outliers
    from easydb_server_spark.operators.text import repetition_metrics

    build_10x(spark, sf_dir)

    docs1 = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs10 = spark.read.parquet(OUT_DOCS)
    emb1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb10 = spark.read.parquet(OUT_EMB)

    cases = {
        "text_repetition": (
            lambda: repetition_metrics(docs1, "text", "doc_id"),
            lambda: repetition_metrics(docs10, "text", "doc_id"),
        ),
        "emb_label_outliers": (
            lambda: label_outliers(emb1, "embedding", "label", "vec_id"),
            lambda: label_outliers(emb10, "embedding", "label", "vec_id"),
        ),
        "emb_label_outliers_approx": (
            lambda: label_outliers(emb1, "embedding", "label", "vec_id", exact=False),
            lambda: label_outliers(emb10, "embedding", "label", "vec_id", exact=False),
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
