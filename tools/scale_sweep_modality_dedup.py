"""Scaling sweep for the r14 modality-dedup operators
(operators/imagehash.py dHash pairs, operators/audiofp.py fingerprint
groups).

The 100 TB claims under test:

* image dHash near-dup: candidates come from an equi-join on
  (band, value) — quadratic work confined to same-bucket collisions.
  Holding the near-dup GROUP SIZE fixed (~10 members) and growing the
  NUMBER of groups, pair count and wall time must grow ~linearly in
  corpus size (an all-pairs join would grow quadratically: 10x corpus
  -> 100x pairs);
* audio fingerprint dedup: one keyed shuffle on a 32-char digest —
  the exact-dedup plan shape — so the same linearity holds trivially;
  the sweep also re-asserts bit-identical results under 4- vs
  64-partition input at the largest size (hash/argmax integer
  discipline).

Corpora are synthesized from doc_id arithmetic exactly like the
conformance fixtures. The IMAGE corpus uses ``base = doc_id %
(n // GROUP)`` so its groups stay ~GROUP members at every scale. The
AUDIO fixture reuses the conformance recipe, whose bin recipe depends
only on ``base % 30`` — 30 distinct recordings total — so past n=300
its groups FATTEN with n (13 members at n=400 -> 133 at n=4000)
instead of multiplying; SCALE.md's sweep table reports exactly that,
and the audio linearity claim rests on the one-keyed-shuffle plan
shape, not on fixed group size.

Usage: python tools/scale_sweep_modality_dedup.py [sf_dir]  # one JSON line
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SIZES = (400, 1600, 4000)
# r15 extension (verdict ask #6): the 4k-point wall times were FLAT
# (0.93/0.74/0.56 s) — the pair stage sat on the scheduling floor, so
# the r14 sweep proved pair-count linearity but not TIME linearity.
# 40k proved too SMALL on this host (end-to-end x1.5 on a 10x corpus
# — still floor-shared), so the sweep goes to 400k images (40,000
# groups; the (base // 6160)-gated recipe term keeps groups distinct
# to 98,560). Timing is end-to-end (sig stage + pair stage) — the
# cost a user pays — with the two stages also reported separately.
SIZES_IMAGE = (400, 1600, 4000, 40000, 400000)
GROUP = 10


def _image_blobs(spark, n: int):
    import pandas as pd

    groups = n // GROUP

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.gif import encode_gif

        pal = np.array(
            [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
            dtype=np.uint8,
        )
        for pdf in batches:
            out = []
            for doc_id in pdf["id"]:
                did = int(doc_id)
                base = did % groups
                w, h = 12 + base % 5, 10 + base % 4
                y, x = np.mgrid[0:h, 0:w]
                # per-base gradient multipliers keep recipes DISTINCT
                # up to 6160 groups (the conformance fixture's fixed
                # 5/7 multipliers saturate at 80 — the first sweep run
                # measured exactly that: groups merged and pairs grew
                # 53x on a 10x corpus). The (base // 6160)-gated
                # nonlinear term extends distinctness to 98,560 groups
                # for the r15 400k point while leaving every base
                # < 6160 — i.e. every pre-r15 sweep point — BYTE-
                # identical; it is zero at pixel (0,0), so the odd-id
                # near-dup jitter still flips at most one dHash bit.
                idx = (
                    base * 3
                    + y * (2 + (base // 20) % 7)
                    + x * (3 + (base // 140) % 11)
                    + ((base // 6160) % 16) * ((y * x) % 13)
                ) % 16
                if did % 2 == 1:
                    idx[0, 0] = (idx[0, 0] + 8) % 16
                out.append((did, encode_gif(pal[idx])))
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    return spark.range(n).repartition(32).mapInPandas(build, "doc_id bigint, payload binary")


def _audio_blobs(spark, n: int):
    import pandas as pd

    groups = n // GROUP

    def build(batches):
        import numpy as np

        from easydb_server_spark.operators.wav import encode_wav

        j = np.arange(64, dtype=np.float64)
        for pdf in batches:
            out = []
            for doc_id in pdf["id"]:
                did = int(doc_id)
                base, amp = did % groups, float(8000 + (did % 5) * 3000)
                segs = [
                    np.round(
                        amp * np.sin(2.0 * np.pi * (1 + (base * 7 + k * 11) % 30) * j / 64.0)
                    )
                    for k in range(4)
                ]
                out.append((did, encode_wav(np.concatenate(segs).astype(np.int16), 8000)))
            yield pd.DataFrame(out, columns=["item_id", "payload"])

    return spark.range(n).repartition(32).mapInPandas(build, "item_id bigint, payload binary")


def main() -> int:
    from easydb_server_spark import get_spark
    from easydb_server_spark.operators.audiofp import (
        audio_fingerprint,
        fingerprint_dup_groups,
    )
    from easydb_server_spark.operators.imagehash import dhash_pairs, image_dhash

    spark = get_spark("modality-dedup-sweep")
    out = {"sweep": "modality-dedup", "group_size": GROUP, "image": [], "audio": []}

    # warm pass: session/codegen/Python-worker startup must not be
    # billed to the first (smallest) size
    dhash_pairs(
        image_dhash(_image_blobs(spark, 100), "payload", "doc_id"), max_hamming=3
    ).count()
    fingerprint_dup_groups(
        audio_fingerprint(_audio_blobs(spark, 100), "payload", "item_id")
    ).count()

    import pyspark.sql.functions as F

    import statistics

    for n in SIZES_IMAGE:
        # sig stage timed separately: encode -> decode -> hash ->
        # checkpoint is the map-only Arrow stage a user pays per image;
        # the PAIR stage (banded join) is the part an all-pairs design
        # would blow up. End-to-end linearity needs both.
        t0 = time.perf_counter()
        blobs = _image_blobs(spark, n)
        sigs = image_dhash(blobs, "payload", "doc_id").localCheckpoint(eager=True)
        sig_sec = round(time.perf_counter() - t0, 2)
        # median of 3 timed runs (the bench.py discipline): the small
        # sizes sit near the scheduling floor where single-run noise
        # is the size of the signal
        samples, n_pairs, pairs = [], 0, None
        for _ in range(3):
            t0 = time.perf_counter()
            pairs = dhash_pairs(sigs, max_hamming=3).localCheckpoint(eager=True)
            n_pairs = pairs.count()
            samples.append(time.perf_counter() - t0)
        sec = round(statistics.median(samples), 2)
        # split true near-dups (same base recipe) from cross-base
        # dHash coincidences — the planted linearity lives in the
        # FORMER; the latter is recipe-space saturation (4000 16-color
        # gradient recipes cannot all stay >3 bits apart) and is the
        # honest reason total pairs grow superlinearly at 40k
        groups = n // GROUP
        within = pairs.where(
            F.col("item_a") % groups == F.col("item_b") % groups
        ).count()
        out["image"].append(
            {
                "n": n,
                "pairs": n_pairs,
                "within_base": within,
                "sig_sec": sig_sec,
                "pair_sec": sec,
                "sec": round(sig_sec + sec, 2),
            }
        )

    for n in SIZES:
        blobs = _audio_blobs(spark, n)
        t0 = time.perf_counter()
        groups = fingerprint_dup_groups(audio_fingerprint(blobs, "payload", "item_id"))
        n_canon = groups.where("is_canonical").count()  # == distinct fingerprints
        out["audio"].append(
            {"n": n, "canonical": n_canon, "sec": round(time.perf_counter() - t0, 2)}
        )

    # partitioning invariance at the largest size (integer discipline)
    big = _audio_blobs(spark, SIZES[-1])
    a = sorted(
        (r["item_id"], r["fp"], r["group_size"], r["is_canonical"])
        for r in fingerprint_dup_groups(
            audio_fingerprint(big.repartition(4), "payload", "item_id")
        ).collect()
    )
    b = sorted(
        (r["item_id"], r["fp"], r["group_size"], r["is_canonical"])
        for r in fingerprint_dup_groups(
            audio_fingerprint(big.repartition(64), "payload", "item_id")
        ).collect()
    )
    out["audio_repartition_mismatches"] = sum(x != y for x, y in zip(a, b)) + abs(
        len(a) - len(b)
    )

    i1 = out["image"][0]
    i10 = next(r for r in out["image"] if r["n"] == 4000)
    i100 = out["image"][-1]
    out["image_pairs_ratio_10x"] = round(i10["pairs"] / max(i1["pairs"], 1), 2)
    out["image_sec_ratio_10x"] = round(i10["sec"] / max(i1["sec"], 1e-9), 2)
    # the out-of-fixed-cost-regime slope: 40k -> 400k images (10x)
    i40 = next(r for r in out["image"] if r["n"] == 40000)
    out["image_pairs_ratio_40k_400k"] = round(i100["pairs"] / max(i40["pairs"], 1), 2)
    out["image_within_ratio_40k_400k"] = round(
        i100["within_base"] / max(i40["within_base"], 1), 2
    )
    out["image_sec_ratio_40k_400k"] = round(i100["sec"] / max(i40["sec"], 1e-9), 2)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
