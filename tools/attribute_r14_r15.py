"""Attribute the r14→r15 bench regressions on the stage-heavy cluster
(r15 verdict ask #2): pq_adc_topk, emb_kmeans_assign,
dedup_bloom_admits measured >=x2 over their r14 records in the judge's
re-timings, on a session where tpch_q1 ran FASTER than r14 — so
"uniform host drift" cannot explain it and the queries are perf-weak
until attributed.

What is already known by diff (verified before this tool ran): the
five suspect query wrappers are byte-identical r14→r16 and their
operators (pq.py, similarity.py, bloom.py) have ZERO changed lines;
kmeans.py changed only in the large-k*d dispatch the bench query
(k=8, d=32 → k*d=256) never takes. The open hypotheses are therefore
(a) bench-context: r15's bench.py runs the calibration probe first and
carries a different headline tail, so accumulated JVM/GC/page-cache
state at each query's suite position differs; (b) host scheduler-share
drift that taxes stage-heavy plans specifically; (c) an unnoticed
behavioral change reachable through the import graph. A code A/B
refutes or confirms (c); matching absolute numbers against the r14/r15
records arbitrates (a) vs (b).

Method: git worktree of the r14 round-final code (28af4f6) beside the
current tree; SAME parquet bytes for both sides (the main repo's
benchdata relayout, passed as an absolute dir so neither side
re-relayouts); sides alternate at the SESSION level A/B/A/B… (each
session = fresh JVM: warm passes, an inline CPU probe, then
runs-per-session timed drains per query), so slow host drift hits both
sides equally while each side still gets multiple independent JVMs.
The child re-execs THIS file with the side's repo prepended to
sys.path — the worktree's own tools/ is never imported.

Usage: python tools/attribute_r14_r15.py [sf_dir]
Prints one JSON line; the conclusion paragraph lives in SCALE.md
("r16: r14→r15 stage-heavy bench attribution").
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

R14_COMMIT = "28af4f6"
WORKTREE = _REPO / ".worktrees" / "r14ab"
QUERIES = [
    "tpch_q1",            # scan-agg control (the judge's yardstick)
    "pq_adc_topk",
    "ivfpq_adc_topk",
    "emb_kmeans_assign",
    "dedup_bloom_admits",
    "sim_ivfpq_recall",
]
SESSIONS_PER_SIDE = 4
RUNS_PER_SESSION = 3
PROBE_ROWS = 4_800_000_000  # bench.py's frozen CPU-probe workload


def _drain(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def _child(repo: str, data_dir: str) -> int:
    """Run one session's worth of measurements inside ``repo``'s code
    tree and print a JSON line: {probe_sec, samples: {q: [sec, ...]}}."""
    sys.path.insert(0, repo)
    # a stale easydb_server_spark from the parent's path must not win
    for mod in [m for m in sys.modules if m.startswith("easydb_server_spark")]:
        del sys.modules[mod]

    from easydb_server_spark import get_spark
    from easydb_server_spark.queries import spark_queries

    spark = get_spark("r14r15-ab")
    qs = spark_queries()

    # bench.py's warm-up shape: one scan query + the Python worker pool
    _drain(qs["core_distinct"](spark, data_dir))
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _noop(s):
        return s

    spark.range(64).select(_noop(col("id").cast("double"))).count()

    # inline CPU probe (same workload as bench.py's probe_sec, carried
    # here so the r14 side — whose bench.py predates the probe — runs
    # the identical yardstick): median of 3
    probes = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(PROBE_ROWS).selectExpr(
            "sum(id % 7) as a", "count(if(id % 11 = 0, 1, null)) as b"
        ).collect()
        probes.append(time.perf_counter() - t0)
    probe_sec = statistics.median(probes)

    samples: dict[str, list[float]] = {}
    for name in QUERIES:
        fn = qs[name]
        _drain(fn(spark, data_dir))  # per-query warm pass (bench.py's rule)
        samples[name] = []
        for _ in range(RUNS_PER_SESSION):
            t0 = time.perf_counter()
            _drain(fn(spark, data_dir))
            samples[name].append(round(time.perf_counter() - t0, 4))
    print(json.dumps({"probe_sec": round(probe_sec, 4), "samples": samples}))
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        return _child(sys.argv[2], sys.argv[3])

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from tools.relayout import ensure_relayout

    data_dir = str(Path(ensure_relayout(sf_dir)).resolve())

    if not WORKTREE.exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(WORKTREE), R14_COMMIT],
            cwd=_REPO, check=True, capture_output=True,
        )

    sides = {"r14": str(WORKTREE), "r16": str(_REPO)}
    pooled: dict[str, dict[str, list[float]]] = {
        s: {q: [] for q in QUERIES} for s in sides
    }
    probes: dict[str, list[float]] = {s: [] for s in sides}
    session_medians: dict[str, list[dict[str, float]]] = {s: [] for s in sides}

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    for i in range(SESSIONS_PER_SIDE):
        for side, repo in sides.items():  # alternate within each round
            t0 = time.time()
            # cwd AND PYTHONPATH point at the side's tree: the driver
            # imports via sys.path.insert, but the Python WORKERS
            # resolve easydb_server_spark through their own cwd/env —
            # both must see the same side's code
            proc = subprocess.run(
                [sys.executable, str(Path(__file__).resolve()), "--child", repo, data_dir],
                cwd=repo, env={**env, "PYTHONPATH": repo},
                capture_output=True, text=True, timeout=1200,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            if proc.returncode != 0 or not line.startswith("{"):
                print(proc.stderr[-2000:], file=sys.stderr)
                raise RuntimeError(f"child failed: side={side} session={i}")
            rec = json.loads(line)
            probes[side].append(rec["probe_sec"])
            for q, xs in rec["samples"].items():
                pooled[side][q].extend(xs)
            session_medians[side].append(
                {q: round(statistics.median(xs), 3) for q, xs in rec["samples"].items()}
            )
            print(
                f"# session {i} side={side} probe={rec['probe_sec']:.2f} "
                f"wall={time.time() - t0:.0f}s", file=sys.stderr,
            )

    out = {
        "attribution": "r14-vs-r15-stage-heavy",
        "r14_commit": R14_COMMIT,
        "sessions_per_side": SESSIONS_PER_SIDE,
        "runs_per_session": RUNS_PER_SESSION,
        "probe_median": {
            s: round(statistics.median(p), 3) for s, p in probes.items()
        },
        "session_medians": session_medians,
    }
    for q in QUERIES:
        a, b = pooled["r14"][q], pooled["r16"][q]
        out[q] = {
            "r14_median": round(statistics.median(a), 3),
            "r16_median": round(statistics.median(b), 3),
            "r14_spread": round(max(a) - min(a), 3),
            "r16_spread": round(max(b) - min(b), 3),
            "r16_over_r14": round(statistics.median(b) / statistics.median(a), 3),
        }
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
