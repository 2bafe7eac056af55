"""Attribute the three r12→r13 bench regressions (r13 verdict ask #3):
multimodal_gif_frames ×1.45, multimodal_audio_g711 ×1.38, pq_adc_topk
×1.35. The suspect: r13's fixture relayout (BENCH_r12 ran the
driver's single-row-group fixtures; BENCH_r13 ran the multi-row-group
relayout that halved the TPC-H block) — more/smaller row groups mean
more tasks and more, smaller Arrow batches into the mapInPandas codec
stages, which could tax per-batch Python overhead. GIF/G.711 operator
code is unchanged r12→r13 (git-verified), so the A/B isolates layout.

Method: ONE session, interleaved A/B/A/B (srg = the sf dir as-given,
mrg = tools/relayout.ensure_relayout output) so JIT/GC/page-cache
effects hit both sides equally; median of RUNS per side per query;
both sides warm-passed first.

Usage: python tools/attribute_r13_codecs.py [sf_dir]
Prints one JSON line; the conclusion paragraph lives in SCALE.md
("r14: r13 codec-bench regression attribution").
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

QUERIES = ["multimodal_gif_frames", "multimodal_audio_g711", "pq_adc_topk"]
RUNS = 7


def _drain(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from easydb_server_spark import get_spark
    from easydb_server_spark.queries import spark_queries
    from tools.relayout import ensure_relayout

    mrg_dir = ensure_relayout(sf_dir)
    spark = get_spark("codec-attrib")
    qs = spark_queries()

    # warm both sides: codegen, scan listing, Python worker pool
    for name in QUERIES:
        _drain(qs[name](spark, sf_dir))
        _drain(qs[name](spark, mrg_dir))

    samples: dict[str, dict[str, list[float]]] = {
        n: {"srg": [], "mrg": []} for n in QUERIES
    }
    for _ in range(RUNS):
        for name in QUERIES:
            for side, d in (("srg", sf_dir), ("mrg", mrg_dir)):
                t0 = time.perf_counter()
                _drain(qs[name](spark, d))
                samples[name][side].append(time.perf_counter() - t0)

    out = {"attribution": "r13-codec-regressions", "runs": RUNS}
    for name in QUERIES:
        srg = samples[name]["srg"]
        mrg = samples[name]["mrg"]
        out[name] = {
            "srg_median": round(statistics.median(srg), 3),
            "mrg_median": round(statistics.median(mrg), 3),
            "srg_spread": round(max(srg) - min(srg), 3),
            "mrg_spread": round(max(mrg) - min(mrg), 3),
            "mrg_over_srg": round(
                statistics.median(mrg) / statistics.median(srg), 3
            ),
        }
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
