"""Registry-contract locks: the driver's correctness harness verifies
a ~50-entry prefix of REGISTRY, so its composition is load-bearing —
an accidental insertion above the marker silently evicts entry 50 from
driver verification with no failure anywhere else."""

PRIORITY_WINDOW = 50


def test_priority_window_prefix_is_stable():
    from easydb_server_spark.queries import REGISTRY

    names = list(REGISTRY)
    assert names[PRIORITY_WINDOW - 1] == "edge_null_safe_misc", (
        "the driver-verified priority window must close at edge_null_safe_misc; "
        "add new queries AFTER the end-of-window marker in queries/__init__.py "
        f"(found {names[PRIORITY_WINDOW - 1]!r} at position {PRIORITY_WINDOW})"
    )


def test_window_holds_the_round1_unverified_families():
    from easydb_server_spark.queries import REGISTRY

    window = list(REGISTRY)[:PRIORITY_WINDOW]
    for prefix, want in (("join_", 9), ("agg_", 14), ("edge_", 7), ("multimodal_", 3)):
        assert sum(1 for n in window if n.startswith(prefix)) == want, prefix


def test_every_query_has_unique_name_and_callable():
    from easydb_server_spark.queries import REGISTRY, oracle_queries, spark_queries

    assert len(spark_queries()) == len(REGISTRY)
    assert set(oracle_queries()) <= set(REGISTRY)
    assert all(callable(fn) for fn, _ in REGISTRY.values())
