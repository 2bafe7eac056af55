"""Graph centrality over DataFrame edge lists — the link-graph signal
crawl curation pipelines rank hosts with (PageRank, Page et al. 1999;
Common Crawl publishes exactly this per-host ranking for its corpus).
Complements the bounded-round connected-components in
:mod:`easydb_server_spark.operators.clusters`.

EXACT-INTEGER formulation: ranks are fixed-point BIGINTs at scale
1e12 and damping is the rational 17/20, so every update is integer
multiply / floor-divide / sum — bit-identical on any engine, which is
what lets a DuckDB oracle replay the power iteration as unrolled CTEs
(the float formulation would drift in the last ulp across engines and
summation orders). Floor truncation leaks < N units of mass per
iteration (1e-12 relative) — irrelevant to ranking, and deterministic.

Scale shape: a bounded-round superstep like the label-propagation CC —
per iteration ONE join shuffle (ranks x edges on src, edges pre-keyed)
and ONE aggregation shuffle (contributions by dst), plus two one-row
broadcast aggregates (node count, dangling mass). The rank table is
node-width, never edge-width; out-degrees are computed once. At 100 TB
the edge list partitions by src and every iteration reuses that
partitioning; the plan is linear in |E| per iteration with no
all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from easydb_server_spark.operators._localframe import local_frame

RANK_SCALE = 10**12
# damping 0.85 as the exact rational 17/20
_D_NUM, _D_DEN = 17, 20

# r16 (guide §1.2 pick-the-algorithm, §5 driver rules; the
# kmeans/BPE/connected-components dispatch precedent): below this
# DEDUPED edge count the power iteration replays on the driver from
# ONE limit-guarded collect of the narrow (src, dst) pair list —
# 16 MB of BIGINTs at the bound, broadcast-class data by the
# session's own 64 MB autoBroadcastJoinThreshold — because the
# distributed superstep pays per-iteration join/agg job scheduling
# (~0.25 s/job measured) to move a rank table this size. The replay
# computes the IDENTICAL exact-integer update (same floor-div points,
# same dangling redistribution), so ranks are bit-identical;
# anything larger takes the unchanged distributed superstep. Tests
# force both paths onto the same graphs and compare exactly.
DRIVER_PR_MAX_EDGES = 1_048_576


def _driver_pagerank(spark, src, dst, iterations: int) -> DataFrame:
    """Replay the exact distributed update rule on collected edges:
    numpy int64 end to end (all quantities non-negative, so numpy's
    floor ``//`` is Spark's BIGINT ``div``; headroom: 17 * total rank
    mass ≈ 1.7e13 ≪ 2^63)."""
    import numpy as np
    import pyarrow as pa

    nodes = np.unique(np.concatenate([src, dst]))
    n = int(len(nodes))
    if n == 0:
        return local_frame(spark, [], "node bigint, rank bigint")
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    out = np.zeros(n, dtype=np.int64)
    np.add.at(out, si, 1)
    dangling_mask = out == 0
    ranks = np.full(n, RANK_SCALE // n, dtype=np.int64)
    base = (3 * RANK_SCALE) // (20 * n)
    for _ in range(iterations):
        contrib = np.zeros(n, dtype=np.int64)
        np.add.at(contrib, di, ranks[si] // out[si])
        dang = int(ranks[dangling_mask].sum())
        ranks = base + (_D_NUM * (contrib + dang // n)) // _D_DEN
    return spark.createDataFrame(
        pa.table({"node": pa.array(nodes), "rank": pa.array(ranks)})
    )


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 5,
    bounded_memory: bool = False,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list. Returns
    (node, rank) with rank a BIGINT at scale 1e12; dangling mass
    (nodes without out-edges) redistributes uniformly each iteration,
    the standard stochastic-completion fix.

    Update rule (all integer ops):
      contrib(v) = sum over u->v of (r(u) div outdeg(u))
      dangling   = sum of r(u) over u with outdeg 0
      r'(v)      = (3*SCALE div (20*N))
                   + (17 * (contrib(v) + dangling div N) div 20)

    Materialization dial: every re-referenced frame persists either
    way (without pinning, Catalyst re-derives each reference and the
    plan DOUBLES per iteration — audited at 161 exchanges for 3
    unpersisted iterations vs 26 pinned). Default (``bounded_memory=
    False``) builds ONE lazy pinned plan — fastest for the bounded
    iteration counts a ranking signal needs (convergence contracts at
    the 0.85 damping rate, so ~10-30 iterations; measured 1.9 s vs
    5.5 s eager at sf0.1 — the eager cost is per-action scheduling,
    not data), at the cost of per-call cached intermediates living
    until session cleanup. ``bounded_memory=True`` runs EAGER
    supersteps: each iteration's rank state materializes, its
    predecessor unpersists immediately, and the static frames release
    at the end — a long-horizon session iterating many graphs retains
    exactly one node-width frame per call (the superstep-with-actions
    shape of bpe_merges; at 100 TB also checkpoint every ~10
    iterations to truncate lineage).
    """
    e = (
        edges.select(
            F.col(src_col).cast("bigint").alias("src"),
            F.col(dst_col).cast("bigint").alias("dst"),
        )
        .distinct()
        .persist()
    )
    # Driver dispatch (see DRIVER_PR_MAX_EDGES): ONE limit-guarded
    # Arrow collect both probes the size and, when small enough,
    # already holds every edge — no separate count job on either path.
    # ``driver_max_edges`` overrides the bound (r17: lets a
    # conformance entry pin the DISTRIBUTED side so the driver oracle
    # covers both dispatch paths — the r16 verdict's ask #2).
    bound = DRIVER_PR_MAX_EDGES if driver_max_edges is None else driver_max_edges
    probe = e.limit(bound + 1).toArrow()
    if probe.num_rows <= bound and not (
        # NULL endpoints would need the distributed path's SQL
        # three-valued join semantics — don't replicate them in numpy
        probe.column("src").null_count
        or probe.column("dst").null_count
    ):
        try:
            return _driver_pagerank(
                e.sparkSession,
                probe.column("src").to_numpy(),
                probe.column("dst").to_numpy(),
                iterations,
            )
        finally:
            e.unpersist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_row = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("_n")))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out"))
    # r16: the out-degree is STATIC — join it into the node table once
    # and carry `out` through the rank state, instead of re-joining
    # ranks x deg every iteration (one SortMergeJoin + its exchanges
    # per iteration removed; contributions/dangling read the carried
    # column, arithmetic unchanged)
    nodes_deg = (
        nodes.join(deg, nodes["node"] == deg["src"], "left")
        .select("node", "out")
        .persist()
    )

    ranks = nodes_deg.crossJoin(n_row).selectExpr(
        "node", "out", f"CAST({RANK_SCALE} AS BIGINT) div _n AS rank"
    )
    if bounded_memory:
        ranks = ranks.persist()
        ranks.count()
    for _ in range(iterations):
        if not bounded_memory:
            ranks = ranks.persist()
        contrib = (
            ranks.where(F.col("out").isNotNull())
            .join(e, F.col("node") == e["src"])
            .selectExpr("dst", "rank div out AS c")
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = F.broadcast(
            ranks.where(F.col("out").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0)).alias("_dang")
            )
        )
        new_ranks = (
            nodes_deg.join(contrib, nodes_deg["node"] == contrib["dst"], "left")
            .crossJoin(dangling)
            .crossJoin(n_row)
            .selectExpr(
                "node",
                "out",
                f"(CAST(3 * {RANK_SCALE} AS BIGINT) div (20 * _n))"
                " + (17 * (COALESCE(contrib, 0) + _dang div _n) div 20) AS rank",
            )
        )
        if bounded_memory:
            new_ranks = new_ranks.persist()
            new_ranks.count()
            ranks.unpersist()
        ranks = new_ranks
    if bounded_memory:
        for frame in (e, nodes, nodes_deg):
            frame.unpersist()
    return ranks.select("node", "rank")
