"""Multi-row-group bench fixture relayout.

The driver-generated sf0.1 tables are single-file, SINGLE-ROW-GROUP
parquet (SCALE.md "Bench-floor note"): Spark assigns row groups — not
byte ranges — to scan tasks, so a 600k-row lineitem decodes on ONE
core no matter how many are free, and the bench's biggest numbers
measure fixture geometry instead of the engine. Every real table at
100 TB is thousands of row groups / files; this tool rewrites the
fixture the way a real ingest would lay it out (~16 row groups per
table, same rows, same schema, same zstd codec) so the same plans
parallelize.

Library use (bench.py): ``ensure_relayout(sf_dir)`` creates
``<repo>/benchdata/<sfname>-mrg/`` on first call (idempotent, keyed
on source mtimes) and returns its path.

CLI: ``python tools/relayout.py [sf_dir]`` builds the relayout, then
runs the headline bench on BOTH layouts and prints one JSON line with
per-query medians for each — the SCALE.md evidence table.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import pyarrow.parquet as pq

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

TARGET_ROW_GROUPS = 16
MIN_ROWS_PER_GROUP = 4096  # tiny dims stay single-group


def ensure_relayout(sf_dir: str, target_groups: int = TARGET_ROW_GROUPS) -> str:
    """Rewrite ``sf_dir``'s tables with ~``target_groups`` row groups
    each into ``<repo>/benchdata/<sfname>-mrg``; return that path.
    Idempotent: tables are rewritten only when missing or older than
    their source."""
    src = Path(sf_dir)
    out = _REPO / "benchdata" / f"{src.name}-mrg"
    out.mkdir(parents=True, exist_ok=True)
    for f in sorted(src.glob("*.parquet")):
        dst = out / f.name
        if dst.exists() and dst.stat().st_mtime >= f.stat().st_mtime:
            continue
        t = pq.read_table(f)
        per_group = max(-(-t.num_rows // target_groups), MIN_ROWS_PER_GROUP)
        pq.write_table(t, dst, row_group_size=per_group, compression="zstd")
    return str(out)


def _bench_layout(sf_dir: str, runs: int = 5) -> dict[str, float]:
    import statistics
    import time

    from easydb_server_spark import get_spark
    from easydb_server_spark.queries import spark_queries

    from bench import HEADLINE, _drain

    spark = get_spark("relayout-bench")
    qs = spark_queries()
    _drain(qs["core_distinct"](spark, sf_dir))  # warm-up
    timings = {}
    for name in HEADLINE:
        spark.sparkContext.setJobDescription(f"relayout:{name}")
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _drain(qs[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
    spark.sparkContext.setJobDescription(None)
    return timings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mrg_dir = ensure_relayout(sf_dir)
    geom = {
        f.name: pq.ParquetFile(f).metadata.num_row_groups
        for f in sorted(Path(mrg_dir).glob("*.parquet"))
    }
    single = _bench_layout(sf_dir)
    multi = _bench_layout(mrg_dir)
    out = {
        "source": sf_dir,
        "relayout": mrg_dir,
        "row_groups": geom,
        "single_rg": single,
        "multi_rg": multi,
        "total_single_s": round(sum(single.values()), 3),
        "total_multi_s": round(sum(multi.values()), 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
