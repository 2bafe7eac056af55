"""merge_intervals (operators/rangejoin.py) — gaps-and-islands
coalescing semantics on handwritten intervals: overlap merges,
touching ([lo, hi) half-open adjacency) merges, strict gaps split,
keys never mix, and the result is partitioning-independent."""

from __future__ import annotations

import pyspark.sql.functions as F


def _run(spark, rows, repartition=None):
    from easydb_server_spark.operators.rangejoin import merge_intervals

    df = spark.createDataFrame(rows, "k STRING, i BIGINT, lo BIGINT, hi BIGINT")
    if repartition:
        df = df.repartition(repartition)
    out = merge_intervals(df, "k", "lo", "hi", "i")
    return sorted(
        (r["k"], r["island"], r["span_start"], r["span_end"], r["n_events"])
        for r in out.collect()
    )


def test_overlap_touch_and_gap(spark):
    rows = [
        ("a", 1, 0, 10),
        ("a", 2, 5, 15),    # overlaps -> same island
        ("a", 3, 15, 20),   # touches hi=15 -> merges (half-open adjacency)
        ("a", 4, 21, 30),   # gap of 1 -> new island
        ("b", 5, 0, 10),    # other key: own island numbering
    ]
    got = _run(spark, rows)
    assert got == [
        ("a", 1, 0, 20, 3),
        ("a", 2, 21, 30, 1),
        ("b", 1, 0, 10, 1),
    ]


def test_contained_interval_does_not_split(spark):
    rows = [
        ("a", 1, 0, 100),
        ("a", 2, 10, 20),   # fully inside
        ("a", 3, 90, 150),  # extends
        ("a", 4, 200, 210),
    ]
    got = _run(spark, rows)
    assert got == [
        ("a", 1, 0, 150, 3),
        ("a", 2, 200, 210, 1),
    ]


def test_partitioning_invariance(spark):
    rows = [("k%d" % (i % 5), i, (i * 7) % 50, (i * 7) % 50 + 6) for i in range(200)]
    assert _run(spark, rows, repartition=1) == _run(spark, rows, repartition=16)


def test_single_shuffle_before_island_aggregate(spark):
    """The two windows share one (key) exchange; the aggregate adds at
    most one more keyed exchange — never a corpus-wide partition."""
    from easydb_server_spark.operators.rangejoin import merge_intervals

    df = spark.createDataFrame(
        [("a", 1, 0, 10)], "k STRING, i BIGINT, lo BIGINT, hi BIGINT"
    )
    plan = (
        merge_intervals(df, "k", "lo", "hi", "i")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2
    assert "SinglePartition" not in plan
