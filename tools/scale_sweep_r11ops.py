"""Cross-SF sweep of the round-11 operators (PQ train/encode + ADC
search, animated-GIF frame sampling, the fixed-point covariance
rewrite): wall time at sf0.001 / sf0.01 / sf0.1 with one warm pass and
median-of-3, so SCALE.md can argue growth rates from measurements, not
plan shapes alone.

    python tools/scale_sweep_r11ops.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

QUERIES = [
    "pq_codes",
    "pq_adc_topk",
    "multimodal_gif_frames",
    "emb_covariance",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _drain(df):
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def main() -> None:
    from easydb_server_spark import get_spark
    from easydb_server_spark.queries import spark_queries

    spark = get_spark("sweep-r11ops")
    qs = spark_queries()
    print(f"| query | {' | '.join(sf.rsplit('/', 1)[-1] for sf in SFS)} |")
    print("|---|" + "---|" * len(SFS))
    for name in QUERIES:
        cells = []
        for sf in SFS:
            _drain(qs[name](spark, sf))  # warm
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                _drain(qs[name](spark, sf))
                samples.append(time.perf_counter() - t0)
            cells.append(f"{statistics.median(samples):.2f}")
        print(f"| {name} | {' | '.join(cells)} |")


if __name__ == "__main__":
    main()
