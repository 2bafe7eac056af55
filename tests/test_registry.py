"""Registry-contract locks: the driver's correctness harness verifies
a ~50-entry prefix of REGISTRY, so its composition is load-bearing —
an accidental insertion above the marker silently evicts entry 50 from
driver verification with no failure anywhere else.

Round-7 window (new/changed-code-first, then least-driver-evidence):
the sixteen new r7 entries (dedup_incremental, chunk_dedup,
curate_source_cap, text_unigram_logprob, dedup_ngram_spans,
text_ccnet_buckets, text_tfidf_keywords, emb_quantize,
dedup_incremental_fuzzy, chunk_pack, ts_resample_locf,
ts_resample_interp, ts_zorder_key, profile_documents,
quality_gate_events, profile_drift) and text_chunks (trailing-subset fix), the two
remaining never-driver-seen r6 entries, the r1-evidence cohort
(fn_array/fn_hash/fn_struct_map/fn_datetime_convert + seven ts_*),
the r2-evidence dedup_simhash/text_hash_split, and the oldest r4
entries filling to 50 (closing at emb_label_centroids; the ten
late-r7 entries — text_contamination_spans, sim_semdedup,
text_bpe_merges, text_bm25, sim_hybrid_rrf, text_shard_manifest,
text_bpe_apply, curation_pipeline, text_bigram_logprob,
text_curriculum — lead). Rows-only entries stay
out of the window
(they burn a slot on `no_oracle`). Everything driver-green in r4-r6
follows the marker.
"""

PRIORITY_WINDOW = 50


def test_priority_window_prefix_is_stable():
    from easydb_server_spark.queries import REGISTRY

    names = list(REGISTRY)
    assert names[PRIORITY_WINDOW - 1] == "emb_label_centroids", (
        "the driver-verified priority window must close at emb_label_centroids "
        f"(position {PRIORITY_WINDOW}); add new queries AFTER the "
        "end-of-window marker in queries/__init__.py "
        f"(found {names[PRIORITY_WINDOW - 1]!r} at position {PRIORITY_WINDOW})"
    )


def test_window_holds_the_r7_rotation():
    from easydb_server_spark.queries import REGISTRY

    window = list(REGISTRY)[:PRIORITY_WINDOW]
    # new/changed r7 code + never-driver-seen r6 entries lead the window
    assert window[:29] == [
        "text_contamination_spans",
        "sim_semdedup",
        "text_bpe_merges",
        "text_bm25",
        "sim_hybrid_rrf",
        "text_shard_manifest",
        "text_bpe_apply",
        "curation_pipeline",
        "text_bigram_logprob",
        "text_curriculum",
        "dedup_incremental",
        "chunk_dedup",
        "curate_source_cap",
        "text_unigram_logprob",
        "dedup_ngram_spans",
        "text_ccnet_buckets",
        "text_tfidf_keywords",
        "emb_quantize",
        "dedup_incremental_fuzzy",
        "chunk_pack",
        "ts_resample_locf",
        "ts_resample_interp",
        "ts_zorder_key",
        "profile_documents",
        "quality_gate_events",
        "profile_drift",
        "text_chunks",
        "text_stratified_sample",
        "dedup_source_overlap",
    ]
    # the r1-evidence cohort follows
    assert window[29:40] == [
        "fn_array",
        "fn_hash",
        "fn_struct_map",
        "fn_datetime_convert",
        "ts_tumbling",
        "ts_sliding",
        "ts_session_window",
        "ts_date_bin",
        "ts_gap_detection",
        "ts_asof_join",
        "ts_range_join",
    ]
    assert window[40:42] == ["dedup_simhash", "text_hash_split"]
    # rows-only entries never occupy a window slot
    from easydb_server_spark.queries import oracle_queries

    assert set(window) <= set(oracle_queries())


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
            "queries": {n: 99.99 for n in bench.HEADLINE},
            "sf": 0.001,
        },
        separators=(",", ":"),
    )
    assert len(worst) <= 1900, (
        f"compact bench line would be {len(worst)} chars; trim HEADLINE "
        "or shorten the emitted form (driver tail capture is 2000)"
    )
