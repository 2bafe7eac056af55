"""Index-growth sweep: does per-batch incremental dedup stay flat as
the persistent index grows 10×?

This is THE claim behind the incremental-ingest design: per-batch cost
must be proportional to the BATCH, never the corpus. The corpus-size
sweeps measure the build; this one measures the steady state — the
same ~500-doc batch probed against a 1× and a 10× digest index and
MinHash band index (alphabet-rotated replicas ⇒ 10× distinct digests,
not copies).

Expected: exact probe (anti-join on the bucketed digest table) and
fuzzy probe (band join + array verify) wall-clock ~flat, shuffle
~flat — the bucketed index side contributes no exchange, and the
per-batch work (hashing the batch, shuffling its digests) is
unchanged by index size.

Usage: python tools/scale_sweep_index_growth.py [sf_dir]
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
LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"


def get_ui_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.appName("scale-sweep-index-growth")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def replicate(docs, replicas: int):
    parts = []
    for r in range(replicas):
        rot = lambda s, n: s[n:] + s[:n]  # noqa: E731
        src = LOWER + UPPER + DIGIT
        dst = rot(LOWER, r) + rot(UPPER, r) + rot(DIGIT, r)
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                F.translate(F.col("text"), src, dst).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


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
    return {
        "rows": rows,
        "shuffle_mb": round(shuffle_mb, 2),
        "sec": round(statistics.median(samples), 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_ui_spark()
    from easydb_server_spark.operators.dedup import (
        digest_index,
        incremental_dedup,
        incremental_neardup,
        minhash_index,
        write_digest_index,
        write_minhash_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    corpus1 = docs.where("doc_id < 4500")
    corpus10 = replicate(docs.where("doc_id < 4500"), REPLICAS)
    batch = docs.where("doc_id >= 4500").select(
        (F.col("doc_id") + 90_000_000).alias("doc_id"), "text"
    )

    for scale, corpus in (("1x", corpus1), ("10x", corpus10)):
        t0 = time.perf_counter()
        write_digest_index(digest_index(corpus, "text", "doc_id"), f"ig_digest_{scale}")
        bands, sigs = minhash_index(corpus, "text", "doc_id")
        write_minhash_index(bands, sigs, f"ig_mh_{scale}")
        build_s = round(time.perf_counter() - t0, 2)
        n_idx = spark.table(f"ig_digest_{scale}").count()
        print(f"\nindex {scale}: {n_idx} digests (build {build_s}s)")
        exact = measure(
            spark,
            lambda scale=scale: incremental_dedup(
                batch, "text", "doc_id", spark.table(f"ig_digest_{scale}")
            ),
        )
        fuzzy = measure(
            spark,
            lambda scale=scale: incremental_neardup(
                batch,
                "text",
                "doc_id",
                spark.table(f"ig_mh_{scale}_bands"),
                spark.table(f"ig_mh_{scale}_sigs"),
                threshold=0.5,
            ),
        )
        print(f"  exact probe: {exact}")
        print(f"  fuzzy probe: {fuzzy}")
    for scale in ("1x", "10x"):
        for t in (f"ig_digest_{scale}", f"ig_mh_{scale}_bands", f"ig_mh_{scale}_sigs"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
