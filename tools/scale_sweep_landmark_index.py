"""Index-growth sweep for the r16 incremental landmark lifecycle
(operators/audiofp.py: write_landmark_index / incremental_landmark_admit).

The claim under test is the steady state of incremental NEAR-dup audio
ingest: probing a FIXED batch against the persisted landmark index must
cost ~the batch, never the corpus — the bucketed index side contributes
no exchange (pytest locks 3-vs-4 exchanges), so the only corpus-sized
term left is the columnar scan of the landmark table itself, which is
3 narrow columns (~50 B/row, 6 rows/clip) — 5-6 orders of magnitude
smaller than the audio it stands for. This sweep measures that
directly: the same 500-clip batch probed against a 1x and a 10x index.

Landmarks are generated DIRECTLY (Spark-side integer arithmetic, the
big-sweep mod-509 tiered recipe — no WAV decode): extraction cost is
the per-modality sweeps' subject; this tool isolates the probe.

Usage: python tools/scale_sweep_landmark_index.py  # one JSON line
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

import pyspark.sql.functions as F  # noqa: E402

SIZES = (100_000, 1_000_000)
GROUP = 10
BATCH = 500
MOD = 509
RUNS = 5


def _lms(spark, n: int, id_offset: int = 0, pad: int = 0):
    """(item_id, t, lm) for ``n`` clips, 10 gain-identical clips per
    recording group, 4 frames on the mod-509 tiered recipe, fanout-3
    landmarks packed with the default 10-bit fields. ``pad`` shifts
    every anchor time (the padded-copy shape for probe batches)."""
    base = (F.col("id") % F.lit(n // GROUP if n >= GROUP else 1)).alias("g")
    df = spark.range(n).select((F.col("id") + F.lit(id_offset)).alias("item_id"), base)
    peaks = [
        (
            F.lit(1)
            + (
                F.col("g") * 7
                + F.lit(11 * k)
                + F.col("g") * (5 * k)
                + (F.col("g") / F.lit(MOD)).cast("long") * F.lit(23 * k * k + 3)
                + (F.col("g") / F.lit(MOD * MOD)).cast("long")
                * F.lit(41 * k**3 + 13 * k + 7)
            )
            % F.lit(MOD)
        )
        for k in range(4)
    ]
    rows = [
        F.struct(
            F.lit(k + pad).cast("int").alias("t"),
            (
                peaks[k] * F.lit(1 << 20)
                + peaks[k + d] * F.lit(1 << 10)
                + F.lit(d)
            ).alias("lm"),
        )
        for k in range(4)
        for d in range(1, 4)
        if k + d < 4
    ]
    return df.select(
        "item_id", F.explode(F.array(*rows)).alias("r")
    ).select("item_id", F.col("r.t").alias("t"), F.col("r.lm").alias("lm"))


def main() -> int:
    from easydb_server_spark import get_spark
    from easydb_server_spark.operators.audiofp import (
        incremental_landmark_admit,
        write_landmark_index,
    )

    spark = get_spark("landmark-index-sweep")
    out = {"sweep": "landmark-index-growth", "batch": BATCH, "runs": RUNS,
           "group_size": GROUP, "points": []}

    # fixed probe batch: 400 padded copies of groups 0-39 (present in
    # every index — corpus-rejected) + 100 novel clips in disjoint
    # landmark cells (10 recording groups of 10 — the 10 originals
    # admit, the 90 in-batch duplicates batch-reject)
    copies = _lms(spark, 400, id_offset=10_000_000, pad=2)
    novel = (
        _lms(spark, 100, id_offset=20_000_000)
        .withColumn("lm", F.col("lm") + F.lit(1 << 40))  # disjoint cells
    )
    batch = copies.unionAll(novel).localCheckpoint(eager=True)

    for n in SIZES:
        table = f"lm_sweep_idx_{n}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        t0 = time.perf_counter()
        write_landmark_index(_lms(spark, n), table, n_buckets=16)
        build_sec = round(time.perf_counter() - t0, 2)

        samples, admits = [], None
        for _ in range(RUNS + 1):  # first is the warm pass
            t0 = time.perf_counter()
            res = incremental_landmark_admit(
                spark.table(table), batch, min_votes=3, max_bucket=48
            )
            admits = res.where("admitted").count()
            samples.append(time.perf_counter() - t0)
        warm = samples[1:]
        rejected = BATCH - admits
        out["points"].append(
            {
                "n_clips": n,
                "index_rows": n * 6,
                "build_sec": build_sec,
                "probe_sec": round(statistics.median(warm), 2),
                "probe_spread": round(max(warm) - min(warm), 2),
                "admitted": admits,
                "rejected": rejected,
            }
        )
        spark.sql(f"DROP TABLE IF EXISTS {table}")

    a, b = out["points"][0], out["points"][-1]
    out["index_ratio"] = b["n_clips"] / a["n_clips"]
    out["probe_sec_ratio"] = round(b["probe_sec"] / max(a["probe_sec"], 1e-9), 2)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
