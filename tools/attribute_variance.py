"""Attribute the sim_topk_lsh bench spread (BENCH_r06: max−min 2.23 s
vs 0.79 s median) to a stage, using the per-query job names and the
UI REST API.

Two experiments in fresh sessions:

A. cold: run sim_topk_lsh 5×, each run under its own job group, and
   pull per-run stage wall-clock + executorRunTime from the REST API —
   if the spread is Python-worker startup, run 1's extra time
   concentrates in the two pandas_udf stages (corpus signatures /
   query probes) and disappears by run 2.
B. warmed: same, but after a one-row pandas_udf no-op that forces the
   Python worker pool up front — if warmup is the cause, run 1 falls
   in line with the median.

Prints one JSON line with per-run wall times and per-run UDF-stage
executorRunTime for both experiments.
"""

import json
import sys
import time
import urllib.request
from pathlib import Path

import pandas as pd

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

RUNS = 5


def _fresh_session(name: str):
    import os

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName(name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def _stages(spark):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?details=false") as r:
        return json.load(r)


def _run_experiment(sf_dir: str, warm_udf: bool) -> dict:
    from easydb_server_spark.queries.llmops import q_sim_topk_lsh

    spark = _fresh_session(f"lsh-variance-{'warm' if warm_udf else 'cold'}")
    try:
        if warm_udf:
            from pyspark.sql.functions import col, pandas_udf

            @pandas_udf("double")
            def _noop(s: pd.Series) -> pd.Series:
                return s

            spark.range(64).select(_noop(col("id").cast("double"))).count()

        walls = []
        for i in range(RUNS):
            spark.sparkContext.setJobGroup(f"run{i}", f"sim_topk_lsh run {i}")
            t0 = time.perf_counter()
            q_sim_topk_lsh(spark, sf_dir).count()
            walls.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobGroup(None, None)

        # per-run stage attribution: stages carry the jobGroup in
        # their first job's group via the jobs endpoint
        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            jobs = json.load(r)
        stage_to_run: dict[int, str] = {}
        for j in jobs:
            grp = j.get("jobGroup")
            if grp and grp.startswith("run"):
                for sid in j.get("stageIds", []):
                    stage_to_run[sid] = grp
        per_run: dict[str, dict] = {f"run{i}": {"wall_s": walls[i], "stages": []} for i in range(RUNS)}
        for s in _stages(spark):
            grp = stage_to_run.get(s["stageId"])
            if grp is None or s.get("status") == "SKIPPED":
                continue
            per_run[grp]["stages"].append(
                {
                    "stage": s["stageId"],
                    "name": s.get("name", "")[:60],
                    "executorRunTime_ms": s.get("executorRunTime", 0),
                    "tasks": s.get("numCompleteTasks", 0),
                }
            )
        for rec in per_run.values():
            rec["stages"].sort(key=lambda x: -x["executorRunTime_ms"])
            rec["stages"] = rec["stages"][:3]
        return {"walls_s": walls, "per_run": per_run}
    finally:
        spark.stop()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cold = _run_experiment(sf_dir, warm_udf=False)
    warm = _run_experiment(sf_dir, warm_udf=True)
    print(json.dumps({"sf_dir": sf_dir, "cold": cold, "warmed": warm}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
