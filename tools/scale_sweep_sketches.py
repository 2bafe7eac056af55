"""Cross-SF sweep of the round-10 sketch/history operators (bloom
membership probe, bloom-prefiltered dedup admits, Count-Min word
estimates, SCD2 history build): wall time
at sf0.001 / sf0.01 / sf0.1 with one warm pass and median-of-3, so
SCALE.md can argue growth rates from measurements, not plan shapes
alone.

    python tools/scale_sweep_sketches.py
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
    "sketch_bloom_probe",
    "dedup_bloom_admits",
    "sketch_cm_words",
    "ts_scd2_history",
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

    spark = get_spark("sweep-sketches")
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
