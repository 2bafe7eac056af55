"""Exact-integer Lloyd k-means (operators/kmeans.py).

The conformance entry (emb_kmeans_assign) pins the full iteration
history against the DuckDB replay; these tests pin the operator's own
invariants on adversarial geometry the fixture can't guarantee —
argmin optimality, tie-breaking, empty-cluster carry-forward, and
partitioning invariance (the property the INT64 discipline buys).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _frame(spark, rows, d=None):
    # d is documentation-only (row width); the schema is width-agnostic
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )


def test_final_assignment_is_argmin_over_final_centroids(spark):
    """Two well-separated point groups (plus a near-duplicate) must
    separate into two clusters after two Lloyd rounds, and identical
    points must land in the same cluster with identical dist2."""
    from easydb_server_spark.operators.kmeans import kmeans_assign

    rows = [
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 1.0, 1.0, 1.0]),
        (4, [1.0, 1.0, 1.0, 1.0]),
        (5, [0.9, 1.0, 1.0, 1.0]),
        (6, [-1.0, -1.0, -1.0, -1.0]),
    ]
    out = kmeans_assign(_frame(spark, rows), "embedding", "vec_id", k=2, iters=2)
    got = {r["pid"]: (r["cluster"], r["dist2"]) for r in out.collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    # identical points: identical (cluster, dist2)
    assert got[1] == got[2]
    assert got[3] == got[4]
    # near-identical point clusters with its twins
    assert got[5][0] == got[3][0]
    # the two well-separated groups do not share a cluster
    assert got[1][0] != got[3][0]


def test_identical_points_one_cluster_zero_distance(spark):
    """All-identical corpus: every point must land in ONE cluster at
    dist2 == 0 (the seed set collapses to copies of the same vector;
    ties break to the smallest cluster id = 0)."""
    from easydb_server_spark.operators.kmeans import kmeans_assign

    rows = [(i, [0.25, -0.5, 0.125, 1.0]) for i in range(1, 9)]
    out = kmeans_assign(_frame(spark, rows), "embedding", "vec_id", k=3, iters=2).collect()
    assert len(out) == 8
    assert all(r["cluster"] == 0 for r in out)
    assert all(r["dist2"] == 0 for r in out)


def test_empty_cluster_keeps_previous_centroid(spark):
    """k larger than the number of distinct points: the surplus
    clusters get no members and must carry their seed centroids
    without dividing by zero."""
    from easydb_server_spark.operators.kmeans import kmeans_assign

    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 1.0]), (4, [1.0, 1.0])]
    out = kmeans_assign(
        _frame(spark, rows, d=2), "embedding", "vec_id", k=4, iters=2
    ).collect()
    assert len(out) == 4
    assert all(r["dist2"] == 0 for r in out)


def test_partitioning_invariance(spark):
    """The INT64 discipline's whole point: the result is bit-identical
    whether the corpus arrives in 1 partition or 16."""
    from easydb_server_spark.operators.kmeans import kmeans_assign

    rows = [
        (i, [((i * 37 + j * 11) % 19 - 9) / 10.0 for j in range(6)]) for i in range(1, 41)
    ]
    base = _frame(spark, rows, d=6)
    a = kmeans_assign(base.repartition(1), "embedding", "vec_id", k=4, iters=2)
    b = kmeans_assign(base.repartition(16), "embedding", "vec_id", k=4, iters=2)
    ra = sorted((r["pid"], r["cluster"], r["dist2"]) for r in a.collect())
    rb = sorted((r["pid"], r["cluster"], r["dist2"]) for r in b.collect())
    assert ra == rb


def test_seeds_are_md5_order_deterministic(spark):
    """Seed selection is the md5-of-id order, independent of input
    row order."""
    from easydb_server_spark.operators.kmeans import (
        quantize_points,
        seed_centroids,
    )

    rows = [(i, [float(i % 3), float(i % 5)]) for i in range(1, 21)]
    f = _frame(spark, rows, d=2)
    s1 = seed_centroids(quantize_points(f, "embedding", "vec_id"), 5)
    s2 = seed_centroids(
        quantize_points(f.orderBy(F.desc("vec_id")), "embedding", "vec_id"), 5
    )
    assert s1 == s2
    assert [c for c, _ in s1] == [0, 1, 2, 3, 4]

def test_assignment_plan_is_exchange_free(spark):
    """The r13→r14 fix: assignment is a pure projection over a literal
    centroid array. The physical plan of ONE assignment pass over a
    plain in-memory corpus must contain no Exchange and no Join —
    the r13 crossJoin(broadcast)+groupBy(pid) shape shuffled the full
    n x d corpus once per iteration."""
    from easydb_server_spark.operators.kmeans import (
        assign,
        quantize_points,
        seed_centroids,
    )

    rows = [(i, [float(i % 3), float(i % 5)]) for i in range(1, 21)]
    pts = quantize_points(_frame(spark, rows, d=2), "embedding", "vec_id")
    cents = seed_centroids(pts, 4)
    plan = assign(spark, pts, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_closure_assignment_matches_literal_and_is_exchange_free(spark):
    """The r15 large-k*d fallback (ADVICE: the literal-argmin form
    embeds k*d constants into the plan every iteration — 64KB codegen
    method limit risk): the Arrow-batched closure argmin must produce
    BIT-IDENTICAL (cluster, dist2) to the literal projection on a
    shared corpus, and its plan must also be exchange- and join-free
    (the centroids ride the task closure, not the plan tree)."""
    from easydb_server_spark.operators import kmeans

    rows = [
        (i, [float(i % 3) - 0.5, float(i % 5) * 0.25, float(i % 7) - 2.0])
        for i in range(1, 41)
    ]
    pts = kmeans.quantize_points(_frame(spark, rows, d=3), "embedding", "vec_id")
    cents = kmeans.seed_centroids(pts, 4)
    lit = {
        r["pid"]: (r["cluster"], r["dist2"])
        for r in kmeans.assign(spark, pts, cents).collect()
    }
    clo_df = kmeans._assign_closure(pts, cents)
    plan = clo_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    clo = {r["pid"]: (r["cluster"], r["dist2"]) for r in clo_df.collect()}
    assert lit == clo


def test_closure_tiebreak_is_smaller_cluster_id(spark):
    """numpy argmin's first-min-wins must implement the same
    smaller-cluster-id tiebreak as the literal struct-min form: a
    point exactly equidistant from clusters 0 and 1 lands in 0."""
    from easydb_server_spark.operators.kmeans import _assign_closure

    pts = spark.createDataFrame([(7, [1, 0])], "pid BIGINT, q ARRAY<BIGINT>")
    cents = [(0, [0, 0]), (1, [2, 0])]
    [row] = _assign_closure(pts, cents).collect()
    assert (row["cluster"], row["dist2"]) == (0, 1)


def test_assign_dispatches_on_kd_bound(spark, monkeypatch):
    """assign() must route to the closure form past
    LITERAL_ARGMIN_MAX_KD — detectable because the literal form's plan
    carries an array_min projection while the closure form's carries a
    Python stage (ArrowEvalPython/MapInPandas) — and both routes must
    agree on the assignment."""
    from easydb_server_spark.operators import kmeans

    rows = [(i, [float(i % 3), float(i % 5)]) for i in range(1, 21)]
    pts = kmeans.quantize_points(_frame(spark, rows, d=2), "embedding", "vec_id")
    cents = kmeans.seed_centroids(pts, 4)
    big = kmeans.assign(spark, pts, cents)
    assert "MapInPandas" not in big._jdf.queryExecution().executedPlan().toString()
    monkeypatch.setattr(kmeans, "LITERAL_ARGMIN_MAX_KD", 4)  # k*d = 8 > 4
    small = kmeans.assign(spark, pts, cents)
    assert "MapInPandas" in small._jdf.queryExecution().executedPlan().toString()
    a = {r["pid"]: (r["cluster"], r["dist2"]) for r in big.collect()}
    b = {r["pid"]: (r["cluster"], r["dist2"]) for r in small.collect()}
    assert a == b


def test_assign_closure_rejects_noncontiguous_cluster_ids():
    """r15 ADVICE: the numpy first-min-wins argmin IS the
    smaller-cluster-id tiebreak only when ids are contiguous 0..k-1 in
    order; a bare assert vanished under -O, so the contract is now a
    ValueError."""
    import pytest

    from easydb_server_spark.operators.kmeans import _assign_closure

    with pytest.raises(ValueError, match="contiguous 0..k-1"):
        _assign_closure(None, [(1, [0, 0]), (0, [1, 1])])
