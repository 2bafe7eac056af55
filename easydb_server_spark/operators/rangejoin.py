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
