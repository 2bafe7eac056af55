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


# ---------------------------------------------------------------------
# Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
# frequency counterpart of the HLL distinct sketch and the Bloom
# membership filter: a depth x width grid of counters answering
# "about how often did THIS key occur" with one-sided error
# (estimate >= true count; overestimate <= e*N/width with probability
# 1 - (1/e)^depth). Unlike the exact groupBy it replaces, its size is
# FIXED (depth*width counters) no matter how many distinct keys the
# corpus has — the shape that makes corpus-wide token statistics
# persistable and mergeable at 100 TB.
#
# Hashing is the repo's portable md5 family (row r's bucket for a key
# is ('0x'||substr(md5(seed:r:key),1,15)) % width), so a DuckDB oracle
# replays every counter and every estimate exactly — the sketch is
# deterministic, only its ERROR versus exact counts is probabilistic.
#
# Scale shape: build is one explode (depth rows per input row, depth
# <= 8) into one map-side-combinable count aggregate whose result is
# at most depth*width rows, independent of corpus size; merge/append
# is a sum per (r, bucket); estimates broadcast the sketch (KBs) and
# take a min per key — zero wide shuffles anywhere.


def _cm_bucket(key, r: int, width: int, seed: str):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:{r}:"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % width
    ).cast("int")


def cm_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cm1",
) -> DataFrame:
    """Build the (r, bucket, cnt) Count-Min table from ``df[key_col]``
    (one increment per ROW — pre-aggregate upstream to weight). Null
    keys are skipped. At most depth*width rows out."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    _cm_bucket(F.col(key_col), r, width, seed).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("g")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(rows)
        .groupBy(F.col("g.r").alias("r"), F.col("g.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (depth, width, seed):
    counter-wise sum. ``cm_build(x) ⊕ cm_build(y) == cm_build(x ∪ y)``
    exactly (pytest-locked), which is what makes per-shard / per-day
    sketch tables foldable without ever rescanning history."""
    return (
        a.select("r", "bucket", "cnt")
        .unionByName(b.select("r", "bucket", "cnt"))
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cm1",
) -> DataFrame:
    """Point estimates for every key in ``keys``: min over the depth
    rows of the key's counter (missing counter = 0). Returns
    (key_col, est). The sketch side broadcasts — it is at most
    depth*width rows by construction."""
    probes = keys.select(F.col(key_col)).where(F.col(key_col).isNotNull()).distinct()
    probe_rows = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cm_bucket(F.col(key_col), r, width, seed).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("g"),
    ).select(key_col, F.col("g.r").alias("r"), F.col("g.bucket").alias("bucket"))
    return (
        probe_rows.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
