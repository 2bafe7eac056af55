"""Attribute the uniform r7→r8 relational bench drift (r8 verdict ask
#2): did layout v4's larger relational byte floor (orders 16→4 files)
cost the join-heavy TPC-H queries, or was the 3-33% upward drift
session variance?

Method: build BOTH layouts — v4 (640 KB relational floor) and the
r7-style layout (128 KB floor for every table, the geometry BENCH_r07
measured) — then run the drifted query set on both in ONE session,
interleaved A/B/A/B so session-level effects (JIT state, GC phase,
page cache) hit both sides equally, median of `RUNS` per side.

Usage: python tools/attribute_drift.py [sf_dir]
Prints one JSON line; the conclusion paragraph lives in SCALE.md
("r7→r8 relational drift attribution").
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

import pyarrow.parquet as pq

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from tools.relayout import (  # noqa: E402
    MIN_ROWS_PER_GROUP,
    TARGET_ROW_GROUPS,
    ensure_relayout,
)

QUERIES = ["tpch_q1", "tpch_q5", "tpch_q7", "tpch_q14", "setop_union_all"]
RUNS = 7


def _build_r7_layout(sf_dir: str) -> str:
    """The pre-v4 geometry: 128 KB byte floor for EVERY table (so
    orders splits 16 ways again), same codec/rows/schema."""
    src = Path(sf_dir)
    out = _REPO / "benchdata" / f"{src.name}-mrg-r7floor"
    out.mkdir(parents=True, exist_ok=True)
    for f in sorted(src.glob("*.parquet")):
        dst = out / f.name
        if dst.exists() and dst.stat().st_mtime >= f.stat().st_mtime:
            continue
        t = pq.read_table(f)
        bytes_per_row = max(f.stat().st_size / max(t.num_rows, 1), 1.0)
        min_rows = max(MIN_ROWS_PER_GROUP, int(128 * 1024 / bytes_per_row))
        per_file = max(-(-t.num_rows // TARGET_ROW_GROUPS), min_rows)
        n_files = max(t.num_rows // per_file, 1)
        if dst.exists():
            import shutil

            shutil.rmtree(dst) if dst.is_dir() else dst.unlink()
        if n_files <= 1:
            pq.write_table(t, dst, compression="zstd")
        else:
            dst.mkdir(parents=True)
            per_file = -(-t.num_rows // n_files)
            for i in range(n_files):
                pq.write_table(
                    t.slice(i * per_file, per_file),
                    dst / f"part-{i:05d}.parquet",
                    compression="zstd",
                )
    return str(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    v4 = ensure_relayout(sf_dir)
    r7 = _build_r7_layout(sf_dir)

    from easydb_server_spark import get_spark
    from easydb_server_spark.queries import spark_queries

    from bench import _drain

    spark = get_spark("attribute-drift")
    qs = spark_queries()
    # warm both layouts (scan listing, codegen) before any timing
    for d in (v4, r7):
        for name in QUERIES:
            _drain(qs[name](spark, d))

    samples: dict[str, dict[str, list[float]]] = {
        name: {"v4": [], "r7floor": []} for name in QUERIES
    }
    for _ in range(RUNS):
        for name in QUERIES:
            for key, d in (("v4", v4), ("r7floor", r7)):  # interleaved A/B
                spark.sparkContext.setJobDescription(f"drift:{name}:{key}")
                t0 = time.perf_counter()
                _drain(qs[name](spark, d))
                samples[name][key].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    out = {
        "sf_dir": sf_dir,
        "runs": RUNS,
        "queries": {
            name: {
                "v4_median_s": round(statistics.median(s["v4"]), 3),
                "r7floor_median_s": round(statistics.median(s["r7floor"]), 3),
                "v4_spread_s": round(max(s["v4"]) - min(s["v4"]), 3),
                "r7floor_spread_s": round(max(s["r7floor"]) - min(s["r7floor"]), 3),
            }
            for name, s in samples.items()
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
