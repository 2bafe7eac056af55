"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's ``hll_sketch_agg`` / ``hll_union_agg``) — the incremental
counterpart of ``approx_distinct``: per-shard sketches persist as
binary columns and UNION losslessly-enough that yesterday's sketches
plus today's batch answer "distinct users ever" without rescanning
history. This completes the incremental-index family (exact-dedup
digest index, fuzzy-dedup band index, ANN IVF store, now distinct
counts): every one supports append without recomputation.

Accuracy contract: relative standard error 1.04/sqrt(2^lg_k)
(~0.8% at the default lg_k=14); estimates are deterministic for a
given input (the hash is fixed) but implementation-defined, so the
conformance entry is a rows-only check and the accuracy/mergeability
guarantees are pytest-locked against exact counts — the same
principled-substitute pattern as ``agg_approx_distinct``. Union of
per-group sketches is NOT bit-identical to a single global sketch
(small groups stay in sparse list mode; the union promotes), so the
locked property is the error bound, not state equality.

Scale shape: sketch building is a map-side-combinable aggregation —
each partition reduces to one 2^lg_k-register state, the shuffle
carries sketch-width rows (KB), never key-width; the union is a
second sketch-width aggregation. At 100 TB the cost is the scan; a
persisted (day, shard) sketch table turns any retroactive distinct
query into a KB-scale union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_LG_K = 14


def distinct_sketches(
    df: DataFrame, key_col: str, group_col: str, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """Per-group HLL sketch of ``key_col``: (group, sketch binary,
    estimate, n_rows). The sketch column is the persistable artifact;
    the estimate is its point read."""
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(F.hll_sketch_agg(key_col, F.lit(lg_k))).alias("estimate"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def union_estimate(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Merge sketch rows into one estimate — the query a persisted
    sketch table answers without touching raw data. One row:
    (distinct_estimate, n_sketches)."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("distinct_estimate"),
        F.count(F.lit(1)).alias("n_sketches"),
    )


def sketch_append(
    existing: DataFrame, batch: DataFrame, key_col: str, group_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Fold a new batch into a persisted sketch table WITHOUT
    re-reading history: sketch the batch, union per group. Returns the
    new (grp, sketch, estimate, n_rows) table — the append step of the
    incremental lifecycle, same contract as the dedup-index /
    IVF-store appends."""
    fresh = distinct_sketches(batch, key_col, group_col, lg_k)
    both = existing.select("grp", "sketch", "n_rows").unionByName(
        fresh.select("grp", "sketch", "n_rows")
    )
    return both.groupBy("grp").agg(
        F.hll_union_agg("sketch").alias("sketch"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate"),
        F.sum("n_rows").alias("n_rows"),
    )
