"""Duplicate-cluster resolution: connected components over a pair list.

``minhash_pairs``/``ngram_jaccard_pairs`` emit near-duplicate *pairs*;
deduplication needs *clusters* (keep one doc per component). This is
connected components via iterative min-label propagation — the
standard distributed formulation (each round, every node adopts the
smallest label among itself and its neighbors; converges in
O(diameter) rounds):

- state per node: one bigint label;
- the edge set carries explicit self-loops, so "min over self and
  neighbors" is ONE join + ONE groupBy-min per round (the self-loop
  row contributes the node's own label — no second join back to the
  label frame), and round 1 degenerates to a joinless
  ``groupBy(src).min(dst)`` because every label starts equal to its
  doc_id;
- the loop runs driver-side but touches only DataFrames (no collect
  of data; the only driver value is the convergence flag).

At 100 TB: rounds are bounded by component diameter (near-dup
components are shallow — usually ≤3), and each round's shuffle is
|edges|, not |corpus|.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation
from easydb_server_spark.operators._localframe import local_frame

# r16 (guide §1.2 pick-the-algorithm, §5 driver rules): below this
# DEDUPED edge count (explicit self-loops included) the component
# labels are computed on the driver from ONE bounded collect of the
# narrow (src, dst) pair list — ≤4 MB of BIGINTs, the same
# metadata-bounded collect class as the k×d centroid/codebook
# collects in kmeans.py/pq.py — because O(diameter) distributed
# rounds cost one plan-compile + checkpoint + Observation job EACH
# (~0.25 s/round measured) to move a few thousand rows. The driver
# path replays the EXACT distributed iteration (synchronous min-label
# rounds, same max_rounds truncation), so labels are bit-identical on
# every graph, converged or not; anything larger takes the unchanged
# distributed fixpoint. Tests force both paths onto the same graphs
# and compare exactly.
DRIVER_CC_MAX_EDGES = 262_144


def connected_components(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """pairs(doc_a, doc_b) → (doc_id, component) with component =
    min doc_id reachable."""
    # All four edge directions (both orientations + a self-loop per
    # endpoint; the self-loops make each round's min cover the node's
    # OWN label via the same join, so no per-round join back to the
    # label frame is needed) come from ONE in-row explode — the old
    # 4-way unionAll re-executed the caller's pair-generation subplan
    # (often a banded self-join) once per branch.
    # r16: materialize the RAW pair list once (one narrow persist +
    # count — the count doubles as the driver/distributed dispatch
    # probe AND the round-width input, so no second materialization
    # pass runs in either path).
    spark = pairs.sparkSession
    raw = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).persist()
    n_pairs = raw.count()
    if 4 * n_pairs <= DRIVER_CC_MAX_EDGES:
        try:
            pair_rows = [(r[0], r[1]) for r in raw.collect()]
        finally:
            raw.unpersist()
        # the four edge directions (both orientations + self-loops)
        # the distributed explode derives are built in-driver; the
        # replay's per-round min is duplicate-insensitive, so skipping
        # the distributed path's distinct changes nothing.
        edge_rows = []
        for a, b in pair_rows:
            edge_rows += ((a, b), (b, a), (a, a), (b, b))
        return _driver_components(
            spark, edge_rows, raw.schema["src"].dataType, max_rounds
        )
    edges = raw.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                F.struct(F.col("src").alias("src"), F.col("src").alias("dst")),
                F.struct(F.col("dst").alias("src"), F.col("dst").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # Guide §2.2 scale-adaptive partitioning: every round is a join +
    # groupBy over the persisted edge frame, and on a near-dup graph
    # the edge set is usually orders of magnitude smaller than the
    # corpus the pairs came from — running O(diameter) rounds at a
    # fixed width pays map + reduce task launches per round to move a
    # few thousand rows. Size the round width from the measured pair
    # count (~1M pairs → 4M edge rows per task, capped at the
    # session's configured width so a cluster-sized session keeps its
    # parallelism); partition the (round-invariant) edge set by the
    # probe key ONCE so the persisted InMemoryRelation keeps
    # hashpartitioning(dst) visible to the planner and rounds stop
    # re-exchanging the edge side. The distinct runs AFTER the
    # repartition: hash(dst) already co-locates equal (src, dst) rows,
    # so the dedup aggregate reuses that exchange instead of adding a
    # second hash(src, dst) shuffle.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    parts = max(1, min(int(prev_parts), (4 * n_pairs + 3_999_999) // 4_000_000))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    edges = edges.repartition(parts, F.col("dst")).distinct().persist()
    try:
        # Every round is ONE Spark job: the eager localCheckpoint both
        # materializes the new labels (truncating lineage — without it
        # each round re-executes every prior round, quadratic) and
        # fires the Observation aggregate that carries the convergence
        # count back to the driver, so no separate convergence-scan
        # job runs per round.
        def _checkpoint_observed(df, round_no: int):
            obs = Observation(f"cc_chg_{round_no}")
            ck = df.observe(
                obs, F.count(F.when(F.col("_chg"), 1)).alias("n")
            ).localCheckpoint(eager=True)
            return ck, int(obs.get["n"])

        # Round 1 fused: labels start as component=doc_id, so the
        # closed-neighborhood min is just min(dst) per src — no label
        # join, no separate distinct-nodes init job. _chg is true iff
        # some neighbor id undercuts the node's own id.
        labels, changed = _checkpoint_observed(
            edges.groupBy("src")
            .agg(F.min("dst").alias("component"))
            .select(
                F.col("src").alias("doc_id"),
                "component",
                (F.col("component") < F.col("src")).alias("_chg"),
            ),
            1,
        )
        for rnd in range(2, max_rounds + 1):
            if changed == 0:
                break
            # One join + one groupBy per round: the self-loop row
            # (src=dst) carries the node's own label into the min, and
            # doubles as the old-label witness for the convergence
            # flag.
            labels, changed = _checkpoint_observed(
                edges.join(labels, edges.dst == labels.doc_id)
                .groupBy("src")
                .agg(
                    F.min("component").alias("component"),
                    F.min(F.when(F.col("dst") == F.col("src"), F.col("component"))).alias("_own"),
                )
                .select(
                    F.col("src").alias("doc_id"),
                    "component",
                    (F.col("component") < F.col("_own")).alias("_chg"),
                ),
                rnd,
            )
    finally:
        # an exception mid-loop must not leave the SHARED session with
        # the temporary partition setting or a leaked cached edge set
        raw.unpersist()
        edges.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return labels.select("doc_id", "component")


def _driver_components(spark, edge_rows, id_type, max_rounds: int) -> DataFrame:
    """Driver-side replay of the distributed min-label iteration over
    a bounded edge list (both orientations + self-loops, deduped —
    exactly the frame the distributed loop iterates on). Synchronous
    rounds: every node simultaneously adopts min(label of dst) over
    its out-edges (the self-loop carries its own label), stopping when
    a round changes nothing or after ``max_rounds`` — the identical
    schedule, so labels match the distributed path bit-for-bit even on
    a graph whose diameter exceeds ``max_rounds``."""
    from pyspark.sql.types import StructField, StructType

    labels = {}
    for src, dst in edge_rows:
        # round 1 fused (labels start at doc_id): min(dst) per src
        cur = labels.get(src)
        if cur is None or dst < cur:
            labels[src] = dst
    changed = any(c < n for n, c in labels.items())
    rnd = 1
    while changed and rnd < max_rounds:
        new = {}
        for src, dst in edge_rows:
            lab = labels[dst]
            cur = new.get(src)
            if cur is None or lab < cur:
                new[src] = lab
        changed = any(new[n] < c for n, c in labels.items())
        labels = new
        rnd += 1
    fields = StructType(
        [StructField("doc_id", id_type), StructField("component", id_type)]
    )
    return local_frame(spark, sorted(labels.items()), fields)


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster summary: one row per component with its keeper (min id)
    and member count."""
    cc = connected_components(pairs)
    return cc.groupBy("component").agg(
        F.count("*").alias("n_members"),
        # sort numerically before stringifying ("10" < "9" lexically)
        F.concat_ws(
            ",",
            F.transform(F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")),
        ).alias("members_csv"),
    )


def keepers_by_priority(cc: DataFrame, priority: DataFrame) -> DataFrame:
    """Pick each duplicate cluster's keeper by PRIORITY instead of
    min-id — the production selection rule (pipelines keep the
    highest-quality / longest / most-recent member of a near-dup
    cluster, e.g. RefinedWeb and FineWeb keep by quality; min-id is
    only the deterministic default). ``cc`` is
    :func:`connected_components` output (doc_id, component);
    ``priority`` maps doc_id → a comparable priority column named
    ``priority``. Keeper = max priority, ties broken by smallest
    doc_id (so equal-priority exact dups still resolve
    deterministically). Returns (component, keeper, priority).

    Cluster members with NO priority row rank last (null priority,
    NULLS LAST) rather than silently vanishing — an inner join here
    would drop them, and a cluster whose members ALL lacked priority
    rows would yield no keeper at all, so a downstream
    drop-everything-but-keepers anti-join would keep every member of
    that cluster (round-9 ADVICE). With the left join every component
    always yields exactly one keeper; an all-unprioritized cluster
    falls back to min-id with a null priority.

    Scale shape: one join of the component labels with the priority
    column plus a rank window partitioned BY COMPONENT — clusters are
    small (near-dup components are shallow), so the window never sees
    a corpus-sized partition; both shuffles are |clustered docs|, not
    |corpus|.
    """
    from pyspark.sql import Window

    j = cc.join(priority, "doc_id", "left")
    w = Window.partitionBy("component").orderBy(
        F.col("priority").desc_nulls_last(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("component", F.col("doc_id").alias("keeper"), "priority")
    )
