"""Focused tests for operators/clusters.connected_components after the
r16 restructure (self-loop edges → one join + one groupBy per round;
round 1 fused to a joinless groupBy-min)."""

import pyspark.sql.functions as F
import pytest

from easydb_server_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


@pytest.fixture(scope="module")
def pairs(spark):
    # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21,
    # path 7-6-9 entered in mixed orientations
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21), (7, 6), (6, 9)],
        "doc_a bigint, doc_b bigint",
    )


def test_components_min_label(pairs):
    got = {(r.doc_id, r.component) for r in connected_components(pairs).collect()}
    want = {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
        (6, 6), (7, 6), (9, 6),
    }
    assert got == want


def test_output_schema_has_no_internal_columns(pairs):
    assert [f.name for f in connected_components(pairs).schema.fields] == [
        "doc_id",
        "component",
    ]


def test_max_rounds_caps_propagation(pairs):
    # 2 label-propagation rounds reach exactly 2 hops down the chain
    got = {(r.doc_id, r.component) for r in connected_components(pairs, max_rounds=2).collect()}
    assert (4, 2) in got and (5, 3) in got  # chain tail not yet converged
    assert (1, 1) in got and (3, 1) in got


def test_empty_pairs(pairs):
    out = connected_components(pairs.where(F.lit(False)))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "component"]


def test_session_conf_restored(spark, pairs):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    connected_components(pairs).count()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_driver_path_matches_distributed_path(spark, pairs, monkeypatch):
    """r16: small edge sets take the bounded driver union replay; the
    distributed fixpoint must agree bit-for-bit — converged (default
    max_rounds) AND truncated (max_rounds=2, chain not yet settled),
    plus a pseudo-random graph."""
    import random

    from easydb_server_spark.operators import clusters

    rng = random.Random(7)
    rand_pairs = spark.createDataFrame(
        [(rng.randrange(60), rng.randrange(60)) for _ in range(80)],
        "doc_a bigint, doc_b bigint",
    )
    for df, rounds in [(pairs, 20), (pairs, 2), (rand_pairs, 20), (rand_pairs, 3)]:
        fast = {(r.doc_id, r.component) for r in connected_components(df, max_rounds=rounds).collect()}
        monkeypatch.setattr(clusters, "DRIVER_CC_MAX_EDGES", -1)
        slow = {(r.doc_id, r.component) for r in connected_components(df, max_rounds=rounds).collect()}
        monkeypatch.undo()
        assert fast == slow


def test_dedup_clusters_members(pairs):
    rows = {r.component: (r.n_members, r.members_csv) for r in dedup_clusters(pairs).collect()}
    assert rows[1] == (5, "1,2,3,4,5")
    assert rows[10] == (3, "10,11,12")
    assert rows[20] == (2, "20,21")
