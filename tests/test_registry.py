"""Registry-contract locks: the driver's correctness harness verifies
a ~50-entry prefix of REGISTRY, so its composition is load-bearing —
an accidental insertion above the marker silently evicts entry 50 from
driver verification with no failure anywhere else.

Round-3 window: the 22 entries rounds 1-2 never drove (tpch_* from r2,
sup_*, skew_*, r2 dedup/text additions), the 16 new TPC-H completions,
the 6 entries whose code or oracle changed in r3, the 4 new r3
corpus-curation queries, and one real Structured Streaming entry
closing the window at 50.
"""

PRIORITY_WINDOW = 50


def test_priority_window_prefix_is_stable():
    from easydb_server_spark.queries import REGISTRY

    names = list(REGISTRY)
    assert names[PRIORITY_WINDOW - 1] == "stream_session", (
        "the driver-verified priority window must close at stream_session; "
        "add new queries AFTER the end-of-window marker in queries/__init__.py "
        f"(found {names[PRIORITY_WINDOW - 1]!r} at position {PRIORITY_WINDOW})"
    )


def test_window_holds_the_r3_unverified_families():
    from easydb_server_spark.queries import REGISTRY

    window = list(REGISTRY)[:PRIORITY_WINDOW]
    # all 22 TPC-H queries (6 r2 + 16 new) must sit in the window
    assert sum(1 for n in window if n.startswith("tpch_")) == 22
    for prefix, want in (("sup_", 7), ("skew_", 2)):
        assert sum(1 for n in window if n.startswith(prefix)) == want, prefix
    for name in (
        "dedup_simhash_pairs",
        "dedup_embedding_lsh",
        "text_normalize",
        "text_redact",
        "text_vocab",
        "text_mixture",
        "ts_multi_rollup",
        "ts_rolling_1h",
        # r3 code/oracle changes re-verified
        "dedup_minhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "dedup_pipeline_keepers",
        "join_inner_revenue",
        "sim_topk_ivf",
        # r3 new corpus-curation operators
        "text_decontaminate",
        "text_length_histogram",
        "text_ngram_topk",
        "emb_label_centroids",
    ):
        assert name in window, name


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
