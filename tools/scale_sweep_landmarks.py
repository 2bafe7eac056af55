"""Scaling sweep for the r15 landmark operators
(operators/audiofp.py: audio_landmarks_timed / landmark_matches /
landmark_search).

The 100 TB claims under test:

* landmark MATCHING: the candidate join is an equi-join on the
  landmark key, quadratic only INSIDE each landmark bucket, with the
  stop-landmark cap bounding every bucket. Holding the recording
  GROUP SIZE fixed (10 gain-varied copies) and growing the number of
  recordings, true (within-group) matched pairs and wall time must
  grow ~linearly in corpus size;
* landmark SEARCH: a FIXED probe batch (200 padded copies) against a
  growing index — probe cost is bounded by the queries' bucket
  fan-out, not the index size, so search wall time must stay far
  below corpus-linear.

Fixture: frame=256 bin-aligned tone clips (bins 1..127), recipe
p_k = 1 + (b*7 + 11k + b*k*5 + (b//127)*(23k^2+3)
          + (b//16129)*(41k^3+13k+7)) % 127
— the tiered terms keep recordings DISTINCT to 40,000 groups
(verified exhaustively; each tier is zero below its threshold, so
smaller sweep points are unaffected by larger ceilings). The sweep
TOPS OUT at 160k clips BY DESIGN: the landmark space is only
127*127*3 cells, so past ~2 groups/cell the stop cap (48 clips per
landmark, the Zipf guard) would start dropping healthy landmarks —
the tool reports the stopped-landmark count so that boundary is
visible, not hidden.

Usage: python tools/scale_sweep_landmarks.py         # r15 points
       python tools/scale_sweep_landmarks.py --big   # r16 extension

--big (r15 verdict ask #6) runs the sweep ONE DECADE past the r15
ceiling: frame=1024 (rfft bins <= 513, still inside the default
10-bit landmark fields — the packing guard added this round raises if
that ever stops being true) with the same tier structure at mod 509,
at 160k and 640k clips. The 509-bin recipe was verified exhaustively
in numpy before this mode landed: 64,000 groups -> 64,000 distinct
landmark SETS, max 3 groups per landmark cell (vs ~2/cell being the
127-bin ceiling at only 16k groups), ZERO landmarks over the 48-clip
stop cap, and 124 cross-group >=3-shared coincidence pairs (the
honest FP floor, reported by the tool as pairs - within_group).
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

SIZES = (4000, 40000, 160000)
SIZES_BIG = (160000, 640000)
GROUP = 10
QUERIES = 200
FRAME = 256        # --big: 1024
MOD = 127          # --big: 509 (prime < 513 = rfft bins of 1024)
CAP = 48


def _blobs(spark, n: int, queries: int):
    """n source clips (groups of GROUP gain-varied copies of one
    recording) plus ``queries`` padded copies with ids >= n."""
    import pandas as pd

    groups = n // GROUP

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.wav import encode_wav

        j = np.arange(FRAME, dtype=np.float64)
        for pdf in batches:
            out = []
            for doc_id in pdf["id"]:
                did = int(doc_id)
                if did < n:
                    base, off = did % groups, 0
                else:
                    base, off = (did - n) % groups, 1 + did % 3
                amp = float(8000 + (did % 5) * 3000)
                segs = [np.zeros(FRAME * off, dtype=np.float64)] if off else []
                for k in range(4):
                    b = 1 + (
                        base * 7 + 11 * k + base * k * 5
                        + (base // MOD) * (23 * k * k + 3)
                        + (base // (MOD * MOD)) * (41 * k * k * k + 13 * k + 7)
                    ) % MOD
                    segs.append(np.round(amp * np.sin(2.0 * np.pi * b * j / FRAME)))
                out.append((did, encode_wav(np.concatenate(segs).astype(np.int16), 8000)))
            yield pd.DataFrame(out, columns=["item_id", "payload"])

    return (
        spark.range(n + queries)
        .repartition(32)
        .mapInPandas(build, "item_id bigint, payload binary")
    )


def _median3(fn):
    samples = []
    result = None
    for _ in range(3):
        t0 = time.perf_counter()
        result = fn()
        samples.append(time.perf_counter() - t0)
    return result, round(statistics.median(samples), 2)


def main() -> int:
    global FRAME, MOD
    import pyspark.sql.functions as F

    big = "--big" in sys.argv[1:]
    sizes = SIZES
    if big:
        FRAME, MOD, sizes = 1024, 509, SIZES_BIG

    from easydb_server_spark import get_spark
    from easydb_server_spark.operators.audiofp import (
        audio_fingerprint,
        audio_landmarks_timed,
        landmark_matches,
        landmark_search,
    )

    spark = get_spark("landmark-sweep")
    out = {"sweep": "landmarks-big" if big else "landmarks",
           "group_size": GROUP, "queries": QUERIES,
           "frame": FRAME, "mod": MOD, "cap": CAP, "points": []}

    # warm pass (session/codegen/Python-worker startup)
    warm = audio_fingerprint(_blobs(spark, 100, 10), "payload", "item_id", FRAME, FRAME)
    landmark_matches(
        audio_landmarks_timed(warm).select("item_id", "lm").distinct(), 3, CAP
    ).count()

    for n in sizes:
        groups = n // GROUP
        blobs = _blobs(spark, n, QUERIES)
        t0 = time.perf_counter()
        sigs = audio_fingerprint(blobs, "payload", "item_id", FRAME, FRAME)
        lmt = audio_landmarks_timed(sigs, fanout=3).localCheckpoint(eager=True)
        sig_sec = round(time.perf_counter() - t0, 2)
        lms = lmt.where(F.col("item_id") < n).select("item_id", "lm").distinct()
        stopped = (
            lms.groupBy("lm").agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > CAP).count()
        )
        pairs_df, match_sec = _median3(
            lambda: landmark_matches(lms, min_shared=3, max_bucket=CAP)
            .localCheckpoint(eager=True)
        )
        n_pairs = pairs_df.count()
        within = pairs_df.where(
            F.col("item_a") % groups == F.col("item_b") % groups
        ).count()
        hits_df, search_sec = _median3(
            lambda: landmark_search(
                lmt.where(F.col("item_id") < n),
                lmt.where(F.col("item_id") >= n),
                min_votes=3,
                max_bucket=CAP,
            ).localCheckpoint(eager=True)
        )
        hits = hits_df.count()
        own = hits_df.where(
            F.col("match_id") % groups == (F.col("query_id") - n) % groups
        ).count()
        out["points"].append(
            {
                "n": n,
                "sig_sec": sig_sec,
                "match_sec": match_sec,
                "pairs": n_pairs,
                "within_group": within,
                "stopped_landmarks": stopped,
                "search_sec": search_sec,
                "search_hits": hits,
                "search_own_group": own,
            }
        )

    a, b = out["points"][0], out["points"][-1]
    scale = b["n"] / a["n"]
    out["corpus_ratio"] = scale
    out["within_pairs_ratio"] = round(b["within_group"] / max(a["within_group"], 1), 2)
    out["match_sec_ratio"] = round(b["match_sec"] / max(a["match_sec"], 1e-9), 2)
    out["search_sec_ratio"] = round(b["search_sec"] / max(a["search_sec"], 1e-9), 2)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
