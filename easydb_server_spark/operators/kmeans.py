"""Distributed Lloyd k-means over an embedding column, exact in INT64.

The missing clustering primitive next to operators/similarity.py's IVF
(which trains its coarse quantizer by grid seeding) — k-means is the
workhorse for corpus bucketing, SemDeDup-style pruning, IVF training,
and mixture balancing in a training-data pipeline. The reference
(a DataFusion SQL gateway, src/controllers.rs) has no clustering
surface at all; this is part of the repo's declared LLM-pipeline
superset.

Why exact integers: the conformance harness compares against a DuckDB
replay, and float centroid means are order-of-summation dependent —
the exact class of flake the r10 `emb_covariance` post-mortem killed.
So every quantity here is a BIGINT:

* coordinates quantize once, per-row, to ``floor(x * 10^6)`` (cast
  float->double exact, one IEEE multiply + floor both engines agree
  on);
* distances are integer sums of squared integer differences;
* centroid updates are ``round-half-away-from-zero(sum / count)``
  computed as one integer div + mod + compare
  (functions/exactround.scaled_round_half), so the new centroid stays
  on the same 1e-6 grid and both engines reproduce it bit-for-bit
  under ANY partitioning.

Headroom (embedding coords |x| < 1e3): |q| < 1e9, per-dim squared
diff < 4e18/d ... for the fixture's |x| < 1 geometry |q| <= ~1.2e6,
dist2 <= d * (2.4e6)^2 ~ 4e14 at d=64, and a per-(cluster,dim) sum
overflows INT64 only past ~7e12 members per cluster. NOTE the
failure mode past that bound is ASYMMETRIC, not merely wrong-both-
sides: Spark's SUM(long) wraps silently while DuckDB's SUM promotes
to HUGEINT and the CAST back to BIGINT raises — the engines diverge
rather than fail together, so the conformance harness WOULD catch an
overflow (as a hash mismatch or oracle error), never mask one.

Scale shape (the 100 TB reading):

* seeding is a deterministic md5-order top-k
  (TakeOrderedAndProject — no full sort, no extra shuffle);
* each assignment is map-only, ZERO exchange of the points (r13
  used crossJoin(broadcast)+groupBy(pid), which re-shuffled the full
  n x d corpus once per iteration just to reduce the k candidate
  rows). For k*d <= LITERAL_ARGMIN_MAX_KD the k centroids enter the
  plan as a literal array<struct<dist2-expr, cluster>> and the
  argmin is F.array_min over that array per row; past that bound the
  literal form's plan-size cost (64KB codegen method limit,
  per-iteration constant folding) outweighs its JVM-side win, so
  assign() switches to an Arrow-batched closure argmin — same exact
  INT64 result, centroids in the task closure instead of the plan;
* each update shuffles only partial aggregates: posexplode to
  (cluster, dim) rows is map-side combined before the exchange, so
  the shuffle volume is bounded by partitions x k x d, NOT n x d;
* per-iteration driver traffic is the k x d centroid table itself
  (the same bounded collect Spark MLlib's KMeans does) — centroids
  re-enter the plan as literals, keeping lineage flat across
  iterations.

Ties (equal squared distance) break toward the SMALLER cluster id on
both engines; empty clusters keep their previous centroid.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.functions.exactround import scaled_round_half

SCALE = 10**6


def quantize_points(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, q: array<bigint>) — coordinates as floor(x * 1e6) INT64."""
    return emb.select(
        F.col(id_col).alias("pid"),
        F.transform(
            F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(SCALE))).cast("long")
        ).alias("q"),
    )


def seed_centroids(pts: DataFrame, k: int) -> list[tuple[int, list[int]]]:
    """k deterministic seeds: the points whose md5(CAST(id AS STRING))
    sort first; cluster ids 0..k-1 follow that md5 order. A top-k by a
    computed key (TakeOrderedAndProject), never a full sort."""
    rows = (
        pts.select("pid", "q", F.md5(F.col("pid").cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    # Re-assert the order driver-side on the SPARK-computed hash column
    # (collect preserves limit order, but the contract is the md5
    # order; re-deriving it via Python str(pid) would silently diverge
    # for float/decimal id columns where str() != CAST AS STRING).
    rows.sort(key=lambda r: r["__h"])
    return [(i, list(r["q"])) for i, r in enumerate(rows)]


def _argmin_sql(cents: list[tuple[int, list[int]]]) -> str:
    """The literal-centroid argmin as ONE SQL string (the
    operators/_litexpr.py rationale): the Column-API form built k*d
    F.lit nodes at one py4j round-trip each — measured 0.45 s PER
    ASSIGNMENT CONSTRUCTION at k=8, d=64, paid three times per
    2-iteration kmeans_assign — while rendering the same tree as text
    and parsing it with one ``F.expr`` call is ~10 ms. The parsed
    expression is identical (integer literals with explicit L/INT
    types, same lambda structure), so results are bit-for-bit."""
    cent_arr = (
        "array("
        + ",".join(
            f"named_struct('cluster',CAST({int(c)} AS INT),'cq',"
            + "array("
            + ",".join(f"{int(v)}L" for v in q)
            + "))"
            for c, q in cents
        )
        + ")"
    )
    return (
        f"array_min(transform({cent_arr}, s -> struct("
        "aggregate(zip_with(q, s.cq, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x) AS dist2, "
        "s.cluster AS cluster)))"
    )


# Plan-size bound for the literal-argmin form: the k centroids embed
# k*d INT64 literals into the Catalyst plan EVERY iteration, so past
# some k*d the plan itself becomes the cost — whole-stage codegen can
# hit the JVM's 64KB method limit and fall back to interpreted
# evaluation, and analysis/constant-folding time grows with the
# literal count. Below the bound (e.g. IVF coarse quantizers:
# k=256, d=16 -> 4096) the zero-exchange projection wins outright;
# above it, assign() switches to an Arrow-batched closure form that
# is STILL zero-exchange (centroids ride the serialized task closure,
# ~16 bytes per value, never the plan tree) and computes the same
# exact-INT64 argmin vectorized in numpy.
LITERAL_ARGMIN_MAX_KD = 4096


def assign(spark: SparkSession, pts: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """(pid, q, cluster, dist2): each point's argmin-distance centroid,
    ties to the smaller cluster id. ZERO exchange either way — the r13
    crossJoin(broadcast)+groupBy(pid) form shuffled one n x d row per
    point per iteration; both forms here shuffle nothing:

    * k*d <= LITERAL_ARGMIN_MAX_KD: a pure projection — per row, map
      the literal centroid array to struct(dist2, cluster) candidates
      and take array_min (struct ordering compares dist2 first then
      cluster, so ties break to the smaller id);
    * k*d > the bound: the same argmin as an Arrow-batched
      mapInPandas over a (batch x k) int64 distance matrix, with the
      centroids in the task closure instead of the plan tree — keeps
      the plan O(1) whatever k*d, at the cost of one Python stage.

    Both paths are exact INT64 and bit-identical to each other (a
    pytest locks the agreement on a shared fixture)."""
    del spark  # kept for call-site compatibility; no frame is built
    k = len(cents)
    d = len(cents[0][1]) if cents else 0
    if k * d > LITERAL_ARGMIN_MAX_KD:
        return _assign_closure(pts, cents)
    # Two-step projection so the argmin struct is evaluated ONCE
    # (CollapseProject refuses to inline non-cheap aliases referenced
    # twice, SPARK-36718), then unpacked.
    return pts.select("pid", "q", F.expr(_argmin_sql(cents)).alias("__best")).select(
        "pid",
        "q",
        F.col("__best.cluster").alias("cluster"),
        F.col("__best.dist2").alias("dist2"),
    )


def _assign_closure(pts: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Large-k*d assignment: exact-INT64 argmin in one Arrow-batched
    map-only stage, centroids shipped via the task closure. Cluster
    ids in ``cents`` are contiguous 0..k-1 in order (seed_centroids'
    contract), so numpy argmin's first-min-wins IS the
    smaller-cluster-id tiebreak."""
    cent_rows = [q for _c, q in cents]
    if [c for c, _q in cents] != list(range(len(cents))):
        # ValueError, not assert: the numpy first-min-wins argmin IS
        # the smaller-cluster-id tiebreak only under this ordering,
        # and `python -O` strips asserts — a violating caller would
        # get silently wrong labels on distance ties.
        raise ValueError(
            "centroid cluster ids must be contiguous 0..k-1 in order "
            "(seed_centroids' contract)"
        )

    def score(batches):
        import numpy as np
        import pandas as pd

        c = np.asarray(cent_rows, dtype=np.int64)  # (k, d)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"pid": pdf["pid"], "q": pdf["q"], "cluster": [], "dist2": []}
                )
                continue
            q = np.asarray([np.asarray(v, dtype=np.int64) for v in pdf["q"]])  # (n, d)
            # (n, k) exact int64 squared distances; diff values are
            # bounded by the same headroom analysis as the literal form
            diff = q[:, None, :] - c[None, :, :]
            dist = (diff * diff).sum(axis=2)
            best = dist.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "pid": pdf["pid"],
                    "q": pdf["q"],
                    "cluster": best.astype("int32"),
                    "dist2": dist[np.arange(len(best)), best],
                }
            )

    return pts.mapInPandas(score, "pid bigint, q array<bigint>, cluster int, dist2 bigint")


def update_centroids(
    assigned: DataFrame, prev: list[tuple[int, list[int]]]
) -> list[tuple[int, list[int]]]:
    """New centroid = round-half-away(sum/count) per (cluster, dim) in
    exact INT64; clusters with no members keep their previous
    centroid. Shuffle volume: map-side-combined (cluster, dim)
    partials — partitions x k x d, independent of n."""
    s = F.col("s")
    mag = scaled_round_half(F.abs(s), F.col("n"))
    upd = (
        assigned.select("cluster", F.posexplode("q").alias("d", "val"))
        .groupBy("cluster", "d")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cluster",
            "d",
            (F.when(s < 0, -F.lit(1)).otherwise(F.lit(1)).cast("long") * mag).alias("v"),
        )
        .collect()
    )
    by_cluster: dict[int, dict[int, int]] = {}
    for r in upd:
        by_cluster.setdefault(r["cluster"], {})[r["d"]] = r["v"]
    out = []
    for c, q in prev:
        if c in by_cluster:
            coords = by_cluster[c]
            out.append((c, [coords[d] for d in range(len(q))]))
        else:
            out.append((c, q))
    return out


def kmeans_assign(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations from md5-order seeds, then return
    the FINAL assignment: (pid, cluster, dist2) per point, exact INT64
    end to end (bit-identical under any partitioning / either engine).
    """
    spark = emb.sparkSession
    pts = quantize_points(emb, vec_col, id_col)
    # the seed job + each iteration's update job re-reads the quantized
    # corpus; persist across the loop (measured 2.26 -> 1.93 s at sf0.1,
    # and at scale it swaps iters+1 parquet scans for one) but release
    # BEFORE returning — the final assignment is lazy, and a cached
    # corpus-sized dataset must not outlive the operator. The final
    # pass pays one fresh scan, same as its uncached cost.
    pts = pts.persist()
    try:
        cents = seed_centroids(pts, k)
        for _ in range(iters):
            assigned = assign(spark, pts, cents)
            cents = update_centroids(assigned, cents)
    finally:
        pts.unpersist()
    return assign(spark, pts, cents).select("pid", "cluster", "dist2")
