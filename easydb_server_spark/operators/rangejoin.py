"""Distributed range (interval-containment) join.

DataFusion 47 (the reference's engine, SURVEY.md §2.B) and Spark both
express ``point BETWEEN lo AND hi`` only as a theta join, which Spark
plans as BroadcastNestedLoopJoin — O(n·m) work and a broadcast
requirement that dies at 100 TB. This operator is the standard
bucketized rewrite:

1. choose a bucket width ``w`` (≈ the typical interval length);
2. explode each interval ``[lo, hi]`` to the buckets it overlaps
   (``ceil((hi-lo)/w)+1`` rows — bounded fan-out, not a cross join);
3. map each point to its single bucket;
4. **equi-join on bucket** (hash-partitioned, one shuffle, AQE-eligible)
   and refine with the exact range predicate.

An interval overlapping k buckets can meet the same point only in the
point's unique bucket, so no post-join dedup is needed. Plan shape:
SortMergeJoin/ShuffledHashJoin on ``__bucket`` — never a nested loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (both numeric, e.g. epoch micros). Returns
    points' columns + intervals' columns.

    ``bucket_width`` trades fan-out (small w → many bucket rows per
    interval) against candidate-set size (large w → more false
    candidates refined away); set it near the median interval length.
    """
    if how != "inner":
        raise ValueError("range_join supports inner joins; outer variants compose via anti-join")

    # floor(), not cast("bigint"): the cast truncates toward zero, which
    # mis-buckets negative coordinates (-1.5 → -1 instead of -2) — fine
    # for epoch micros but wrong for signed domains
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / bucket_width))
    n_buckets = (
        F.floor(F.col(hi_col) / bucket_width) - F.floor(F.col(lo_col) / bucket_width) + 1
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(lo_col) / bucket_width) + n_buckets - 1,
            )
        ),
    )
    return (
        p.join(iv, "__bucket")
        .where((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("__bucket")
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    lo_col: str,
    hi_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Coalesce overlapping-or-touching intervals per key into coverage
    spans — the gaps-and-islands primitive (downtime windows, session
    coverage, retention spans). Intervals are half-open ``[lo, hi)``;
    touching (``next.lo == prev.hi``) merges, a strict gap
    (``lo > running max hi``) opens a new island.

    Returns ``(key, island, span_start, span_end, n_events)`` with
    islands numbered 1..m per key in span order.

    Determinism: the window orders by (lo, hi, tiebreak), so island
    numbering — and therefore the whole result — is independent of the
    input partitioning (``tiebreak_col`` must be unique per row; the
    running-max/new-island VALUES only depend on (lo, hi), but a total
    order keeps the plan's sort stable for free).

    Scale shape: ONE shuffle for the two same-spec running windows
    (partitioned by key — bounded per-key state with external-sort
    spill, never a corpus-wide partition), then the island hash
    aggregate reuses the same (key)-compatible partitioning. Pure
    integer arithmetic when lo/hi are integer columns.
    """
    from pyspark.sql import Window

    order = [F.col(lo_col).asc(), F.col(hi_col).asc(), F.col(tiebreak_col).asc()]
    w_prev = (
        Window.partitionBy(key_col).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key_col).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_hi = F.max(hi_col).over(w_prev)
    new_island = F.when(
        prev_max_hi.isNull() | (F.col(lo_col) > prev_max_hi), 1
    ).otherwise(0)
    return (
        df.withColumn("island", F.sum(new_island).over(w_run))
        .groupBy(key_col, "island")
        .agg(
            F.min(lo_col).alias("span_start"),
            F.max(hi_col).alias("span_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
