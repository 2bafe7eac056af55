"""Registry-contract locks: the driver's correctness harness verifies
a ~50-entry prefix of REGISTRY, so its composition is load-bearing —
an accidental reordering silently evicts entry 50 from driver
verification with no failure anywhere else. Since round 10 the window
is the explicit PRIORITY_WINDOW_NAMES list (REGISTRY is constructed
window-first), so these tests lock the LIST, not comment markers.

Round-16 window (new/changed first, then least driver evidence):
the 10 changed/new entries (image_phash_topk, curation_pipeline_mm,
audio_landmark_topk, audio_landmark_incremental and
stream_landmark_ingest are NEW; image_phash_search re-verifies for the
_phash_ranked refactor + max_bucket guard, dedup_audio_landmark and
audio_landmark_search for the landmark peak_bits/overflow guard,
video_landmark_search for the _landmark_votes refactor,
emb_kmeans_assign for the closure-contract ValueError), then the
pre-declared 20-entry r10-evidence fill (the cohort's last members),
then 18 of the 41-entry r11-evidence cohort (including perf-weak
ivfpq_adc_topk and dedup_bloom_admits). Slots 49-50 COMPLETE the
rows-only execution-evidence tail (text_unigram_train,
stream_funnel_stateful) — after r16 every entry has driver evidence.
"""

PRIORITY_WINDOW = 50


def test_priority_window_prefix_is_stable():
    from easydb_server_spark.queries import PRIORITY_WINDOW_NAMES, REGISTRY

    names = list(REGISTRY)
    assert len(PRIORITY_WINDOW_NAMES) == PRIORITY_WINDOW
    assert names[:PRIORITY_WINDOW] == list(PRIORITY_WINDOW_NAMES), (
        "REGISTRY must iterate the priority window first — its first "
        f"{PRIORITY_WINDOW} names must equal PRIORITY_WINDOW_NAMES"
    )
    assert len(set(names)) == len(names)


def test_window_holds_the_r16_rotation():
    import glob
    import json
    import os

    from easydb_server_spark.queries import REGISTRY
    from tests.conftest import REPO

    window = list(REGISTRY)[:PRIORITY_WINDOW]
    # slots 1-10: r16 changed/new code — the five NEW entries (top-k
    # image retrieval, the multimodal curation pipeline, top-k
    # landmark retrieval, the incremental landmark index, its
    # streaming form) and the five consumers of r16-changed
    # operator code (_phash_ranked refactor + max_bucket, landmark
    # peak_bits/overflow guard x2, _landmark_votes refactor, kmeans
    # closure-contract ValueError); locked as a SET (an r16 fact, not
    # an evidence computation)
    changed = {
        "image_phash_topk", "curation_pipeline_mm", "audio_landmark_topk",
        "audio_landmark_incremental",
        "stream_landmark_ingest",
        "image_phash_search",
        "dedup_audio_landmark", "audio_landmark_search",
        "video_landmark_search",
        "emb_kmeans_assign",
    }
    assert set(window[:10]) == changed
    # slots 11-30: the pre-declared r15->r16 rotation — ALL 20
    # remaining r10-evidence entries (newest driver evidence across
    # CORRECTNESS_r*.json up to r15 — the goalpost is fixed at
    # rotation time)
    newest = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        if rnd > 15:
            continue
        with open(f) as fh:
            for name in json.load(fh):
                newest[name] = max(newest.get(name, 0), rnd)
    r10_cohort = {n for n, r in newest.items() if r == 10}
    assert len(r10_cohort) == 20
    assert set(window[10:30]) == r10_cohort
    # slots 31-48: 18 of the 41-entry r11-evidence cohort
    r11_cohort = {n for n, r in newest.items() if r == 11}
    assert len(r11_cohort) == 41
    assert set(window[30:48]) <= r11_cohort
    assert len(window[30:48]) == 18
    # slots 49-50: the FINAL rows-only execution-evidence tail (r13
    # verdict ask #6, completed this round) — the ONLY rows-only
    # entries allowed in the window, and only to demonstrate the
    # driver executes them
    assert window[48:] == ["text_unigram_train", "stream_funnel_stateful"]
    from easydb_server_spark.queries import oracle_queries

    assert set(window[:48]) <= set(oracle_queries())


def test_every_query_has_unique_name_and_callable():
    from easydb_server_spark.queries import REGISTRY, oracle_queries, spark_queries

    assert len(spark_queries()) == len(REGISTRY)
    assert set(oracle_queries()) <= set(REGISTRY)
    assert all(callable(fn) for fn, _ in REGISTRY.values())


def test_full_tpch_coverage():
    """All 22 TPC-H queries are registered with oracles (Q1-Q22)."""
    from easydb_server_spark.queries import REGISTRY, oracle_queries

    have = {n for n in REGISTRY if n.startswith("tpch_q")}
    assert have == {f"tpch_q{i}" for i in range(1, 23)}
    assert have <= set(oracle_queries())


def test_never_driver_seen_entries_match_their_oracles(spark):
    """Between-rounds conformance for entries the driver has never
    verified (no row in any CORRECTNESS_r*.json): run the Spark query
    and its DuckDB oracle at sf0.001 and compare canonicalized frames.
    Catches an oracle regression in a brand-new entry immediately,
    instead of one round later when the rotated window reaches it.
    Shrinks to a no-op as driver evidence accumulates."""
    import glob
    import json
    import os

    import duckdb
    import pytest

    from easydb_server_spark.compare import canon_frame
    from easydb_server_spark.queries import REGISTRY
    from easydb_server_spark.queries._util import TABLES
    from tests.conftest import REPO, SF_DIR

    seen = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            seen |= set(json.load(fh))
    fresh = [
        (name, fn, oracle)
        for name, (fn, oracle) in REGISTRY.items()
        if name not in seen and oracle is not None
    ]
    if not fresh:
        pytest.skip("every oracled entry has driver evidence")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    for name, fn, oracle in fresh:
        got = canon_frame(fn(spark, SF_DIR).toPandas())
        want = canon_frame(con.execute(oracle).df())
        assert got == want, f"{name}: spark result diverges from its DuckDB oracle"


def test_registry_results_have_scalar_columns_only(spark):
    """Driver-canonicalizer contract: result columns must be atomic.

    The driver sorts/hashes raw pandas cells; ArrayType/MapType/
    StructType cells raise ``TypeError: unhashable type`` there, so an
    array-valued query can never go green regardless of value
    correctness (emb_label_centroids, round 3). Building the DataFrame
    only triggers Spark analysis, not execution, so this walks the
    whole registry cheaply. Streaming entries are excluded — building
    them runs a real micro-batch (~10 s each); their scalar schemas
    are locked by test_streaming_recovery.py / the conformance sweep.
    """
    from pyspark.sql import types as T

    from easydb_server_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    complex_types = (T.ArrayType, T.MapType, T.StructType)
    bad = []
    for name, (fn, _) in REGISTRY.items():
        if name.startswith("stream_"):
            continue
        schema = fn(spark, SF_DIR).schema
        bad.extend(
            f"{name}.{f.name}: {f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, complex_types)
        )
    assert not bad, (
        "non-scalar result columns violate the driver canonicalizer "
        "contract: " + "; ".join(bad)
    )


def test_bench_headline_names_are_registry_entries():
    """A typo'd HEADLINE name only fails at bench runtime (KeyError in
    the driver's per-round bench run) — catch it in CI instead."""
    import bench

    from easydb_server_spark.queries import REGISTRY

    missing = [q for q in bench.HEADLINE if q not in REGISTRY]
    assert missing == [], missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no duplicates


def test_bench_stdout_line_fits_driver_tail_capture():
    """The driver records only the last 2000 chars of bench stdout;
    BENCH_r07.json came back `parsed: null` because the r7 line was
    3.6 kB. Lock the compact line (worst-case 2-dp medians) under the
    budget so adding headline queries can't silently break the round
    record again."""
    import json

    import bench

    worst = json.dumps(
        {
            "metric": f"headline suite (median of {bench.RUNS} warm runs)",
            "value": 99999.999,
            "unit": "sec",
            "fixed_core_sec": 99999.999,
            "probe_sec": 99.999,
            "probe2_sec": 99.999,
            "queries": {n: 99.99 for n in bench.HEADLINE},
            "sf": 0.001,
            "layout": "mrg",
        },
        separators=(",", ":"),
    )
    assert len(worst) <= 1900, (
        f"compact bench line would be {len(worst)} chars; trim HEADLINE "
        "or shorten the emitted form (driver tail capture is 2000)"
    )


def test_float_emitting_entries_are_repartition_invariant(spark):
    """Every oracled entry whose result carries a float column must
    produce the IDENTICAL canonicalized frame when its inputs are one
    partition and when they are 32 — i.e. no order-dependent float
    summation anywhere in the repo (the r10 ``emb_covariance`` flake:
    float Gram partials summed in partition-arrival order flipped a
    ROUND(…,5) boundary between driver runs). Inputs are repartitioned
    via the ``_util._REPARTITION`` dial so the sweep exercises real
    physical partitionings without touching query code; shuffle
    partitions vary in lockstep. Streaming entries are excluded (each
    builds a real micro-batch; their determinism is locked by
    tests/test_streaming_recovery.py's replay-equivalence checks).
    """
    from pyspark.sql import types as T

    from easydb_server_spark.compare import canon_frame
    from easydb_server_spark.queries import REGISTRY, _util, oracle_queries
    from tests.conftest import SF_DIR

    float_types = (T.FloatType, T.DoubleType, T.DecimalType)
    oracled = set(oracle_queries())
    targets = [
        (name, fn)
        for name, (fn, _) in REGISTRY.items()
        if name in oracled
        and not name.startswith("stream_")
        and any(
            isinstance(f.dataType, float_types)
            for f in fn(spark, SF_DIR).schema.fields
        )
    ]
    assert len(targets) >= 100  # the sweep must keep covering the registry

    def run(fn, parts):
        _util._REPARTITION = parts
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            return canon_frame(fn(spark, SF_DIR).toPandas())
        finally:
            _util._REPARTITION = None
            spark.conf.set("spark.sql.shuffle.partitions", "32")

    bad = [name for name, fn in targets if run(fn, 1) != run(fn, 32)]
    assert not bad, (
        "order-dependent float arithmetic: these entries' results "
        f"change with input partitioning: {bad}"
    )


def test_fixed_core_is_the_headline_prefix():
    """The fixed comparison core (r11 contract) must stay the exact
    PREFIX of HEADLINE in its declared order — suite position is part
    of the round-over-round comparability contract — and its
    composition must never change (hash-locked; a legitimate redesign
    updates this lock with an SCALE.md note)."""
    import hashlib

    import bench

    assert bench.HEADLINE[: len(bench.FIXED_CORE)] == bench.FIXED_CORE
    digest = hashlib.md5("|".join(bench.FIXED_CORE).encode()).hexdigest()
    assert digest == "f4ef9dab9d769943b1d79651208f66ed", digest


def test_parity_counts_match_registry():
    """PARITY.md is judge-facing conformance evidence; its §2.B counts
    must never lag the registry again (the r13 verdict found them two
    rounds stale). The lock: the exact counts sentence tracks _DEFS."""
    import os
    import re

    from easydb_server_spark.queries import REGISTRY, oracle_queries
    from tests.conftest import REPO

    with open(os.path.join(REPO, "PARITY.md")) as fh:
        parity = fh.read()
    m = re.search(r"(\d+)\nqueries, (\d+) with exact DuckDB oracles", parity)
    assert m, "PARITY.md no longer states the registry counts sentence"
    assert int(m.group(1)) == len(REGISTRY)
    assert int(m.group(2)) == len(oracle_queries())


def test_plans_md_rows_match_bench_headline():
    """r15 verdict finding #1: PLANS.md went one bench-tail rotation
    stale (image_phash_search benched with no plan row while rotated-
    out sim_hybrid_rrf kept one) because nothing tied the plan audit
    to the headline list. The lock: PLANS.md's table rows must be
    exactly bench.HEADLINE, in order — regenerate with
    `python tools/plan_audit.py` after any headline rotation."""
    import os
    import re

    import bench
    from tests.conftest import REPO

    with open(os.path.join(REPO, "PLANS.md")) as fh:
        plans = fh.read()
    rows = re.findall(r"^\| (\S+) \|", plans, re.M)
    rows = [r for r in rows if r not in ("query", "---")]
    assert rows == list(bench.HEADLINE), (
        "PLANS.md is stale vs bench.HEADLINE — run tools/plan_audit.py "
        f"(missing: {sorted(set(bench.HEADLINE) - set(rows))}; "
        f"extra: {sorted(set(rows) - set(bench.HEADLINE))})"
    )
