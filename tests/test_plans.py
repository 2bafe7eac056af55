"""Physical-plan regression tests — the scale properties SCALE.md
claims, locked in CI: pushdown reaches the scan, dims broadcast,
top-k compiles to TakeOrderedAndProject, and nothing drops to
row-at-a-time Python in the relational suite."""

import contextlib
import io

import pytest

from tests.conftest import SF_DIR


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    from easydb_server_spark.queries import spark_queries

    return spark_queries()


class TestPlans:
    def test_filter_pushdown_reaches_parquet_scan(self, spark, queries):
        p = plan_of(queries["agg_pricing_summary"](spark, SF_DIR))
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p

    def test_column_pruning(self, spark, queries):
        p = plan_of(queries["agg_pricing_summary"](spark, SF_DIR))
        read_schema = next(line for line in p.splitlines() if "ReadSchema" in line)
        assert "l_orderkey" not in read_schema  # unused columns pruned
        assert "l_quantity" in read_schema

    def test_dim_joins_broadcast_not_sortmerge(self, spark, queries):
        p = plan_of(queries["join_inner_revenue"](spark, SF_DIR))
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p

    def test_topk_compiles_to_take_ordered(self, spark, queries):
        p = plan_of(queries["core_limit_offset"](spark, SF_DIR))
        assert "TakeOrderedAndProject" in p

    def test_semi_join_stays_semi(self, spark, queries):
        p = plan_of(queries["join_semi"](spark, SF_DIR))
        assert "LeftSemi" in p

    def test_no_cartesian_outside_cross(self, spark, queries):
        for name in ["join_inner_revenue", "agg_pricing_summary", "subq_in", "window_rank"]:
            p = plan_of(queries[name](spark, SF_DIR))
            assert "CartesianProduct" not in p, name

    def test_relational_suite_has_no_python_udfs(self, spark, queries):
        """Everything except the deliberate Python paths (multimodal
        decode; the LSH signature matmul, which is Arrow-batched BLAS
        by design) must stay JVM-side — and row-at-a-time
        BatchEvalPython is banned in every plan."""
        python_ops = ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas")
        offenders = []
        for name, fn in queries.items():
            if name.startswith("stream_"):
                continue  # streams can't explain pre-start
            p = plan_of(fn(spark, SF_DIR))
            if name.startswith("multimodal") or name in ("sim_topk_lsh", "dedup_embedding_lsh"):
                assert "BatchEvalPython" not in p, name  # Arrow-batched only
                continue
            if any(op in p for op in python_ops):
                offenders.append(name)
        assert offenders == []

    def test_two_phase_aggregation(self, spark, queries):
        p = plan_of(queries["agg_pricing_summary"](spark, SF_DIR))
        assert p.count("HashAggregate") >= 2  # partial + final

    def test_tpch_topk_compiles_to_take_ordered(self, spark, queries):
        """The composed TPC-H workloads must end in
        TakeOrderedAndProject (per-partition top-k + merge), never a
        global sort feeding a limit."""
        for name in ("tpch_q3", "tpch_q10", "tpch_q18"):
            p = plan_of(queries[name](spark, SF_DIR))
            assert "TakeOrderedAndProject" in p, name
            assert "CartesianProduct" not in p, name

    def test_tpch_q18_scans_lineitem_once(self, spark, queries):
        """r3 rewrite: the HAVING aggregate IS the final measure
        (orderkey unique in orders), so lineitem must be scanned
        exactly once — the r2 two-scan form was the suite's slowest
        query."""
        p = plan_of(queries["tpch_q18"](spark, SF_DIR))
        assert p.count("lineitem.parquet") == 1

    def test_tpch_q21_scans_lineitem_once(self, spark, queries):
        """r5 rewrite: the EXISTS/NOT-EXISTS double-correlation is
        resolved with order-level window counts over one per-(orderkey,
        suppkey) aggregate — the r3/r4 form scanned lineitem three
        times (base + semi + anti), 3× fact I/O at scale."""
        p = plan_of(queries["tpch_q21"](spark, SF_DIR))
        assert p.count("lineitem.parquet") == 1

    def test_tpch_q11_reuses_fact_shuffle(self, spark, queries):
        """r5 rewrite: the grand total is derived from the per-part
        aggregate, sharing its shuffle. AQE proves the reuse at
        runtime (the static plan still prints both branches), so
        execute and assert the FINAL plan reuses the exchange. Runs at
        sf0.01: at sf0.001 the NATION_1 slice is empty and AQE folds
        the whole query to EmptyRelation, leaving nothing to reuse."""
        df = queries["tpch_q11"](spark, "/root/testdata/sf0.01")
        df.collect()
        assert "ReusedExchange" in plan_of(df)

    def test_tpch_q2_semi_filters_fact_before_aggregate(self, spark, queries):
        """r5 rewrite: lineitem is restricted to EUROPE suppliers with
        a broadcast semi-join BELOW the per-(part,supplier) cost
        aggregate — the fact table is filtered in place, never
        shuffled on suppkey, and the groupBy shuffle carries only the
        1-of-5-regions survivors."""
        p = plan_of(queries["tpch_q2"](spark, SF_DIR))
        assert "BroadcastHashJoin LeftSemi" in p  # not a fact shuffle
        assert "SortMergeJoin" not in p
        # parents print first in the formatted tree, so the cost
        # aggregate appearing ABOVE the semi join means the semi join
        # executes below (before) it
        assert p.index("HashAggregate") < p.index("BroadcastHashJoin LeftSemi")
        assert p.count("lineitem.parquet") == 1

    def test_minhash_pairs_verification_is_candidate_restricted(self, spark, queries):
        """The exact-Jaccard verification in minhash_pairs must be
        per-candidate-pair (array_intersect inside the row after
        joining candidates to the per-doc shingle arrays), never a
        self-join of the shingle inverted index — that would expand
        every pair sharing a shingle and defeat LSH at scale."""
        import re

        p = plan_of(queries["dedup_minhash_pairs"](spark, SF_DIR))
        assert "array_intersect" in p
        # no join keyed on a shingle-hash column: the only sort-merge
        # join is the bands bucket self-join on (band, band_hash)
        for line in p.splitlines():
            if "Join condition" in line or "Left keys" in line or "Right keys" in line:
                assert not re.search(r"\bh#\d+", line), line

    def test_minhash_signatures_have_zero_exchange(self, spark):
        """MinHash signatures and LSH band keys must compute entirely
        inside the scan's projection (higher-order fold over the
        shingle array) — at 100 TB, any Exchange here shuffles the
        whole corpus before the first candidate exists. The r6 form
        paid two (signature groupBy + band groupBy); the array form
        pays zero."""
        from easydb_server_spark.operators.dedup import minhash_bands, minhash_signatures

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        for df in (minhash_signatures(docs, "text", "doc_id"), minhash_bands(docs, "text", "doc_id")):
            p = plan_of(df)
            assert "Exchange" not in p, p


class TestPartitionPruning:
    def test_partition_filter_prunes_directories(self, spark, tmp_path_factory):
        """Hive-style partitioned layout (the 100 TB table shape):
        a filter on the partition column must prune at planning/run
        time — the scan's PartitionFilters, not a post-scan Filter."""
        import pyspark.sql.functions as F

        out = str(tmp_path_factory.mktemp("part") / "orders_by_status")
        src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        src.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)

        df = spark.read.parquet(out).where(F.col("o_orderstatus") == "F").select("o_orderkey")
        p = plan_of(df)
        assert "PartitionFilters" in p and "o_orderstatus" in p.split("PartitionFilters", 1)[1].split("\n")[0]
        # validates values too, not just the plan string
        want = src.where(F.col("o_orderstatus") == "F").count()
        assert df.count() == want

    def test_dynamic_partition_pruning_on_join(self, spark, tmp_path_factory):
        """DPP: joining the partitioned fact to a filtered dim prunes
        fact partitions via the dim's build side at runtime."""
        import pyspark.sql.functions as F

        out = str(tmp_path_factory.mktemp("dpp") / "orders_by_status")
        src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        src.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)

        fact = spark.read.parquet(out)
        dim = spark.createDataFrame([("F", "finished")], "o_orderstatus string, label string")
        j = fact.join(dim, "o_orderstatus").select("o_orderkey", "label")
        p = plan_of(j)
        assert "dynamicpruning" in p.lower() or "PartitionFilters: [" in p
        assert j.count() == src.where(F.col("o_orderstatus") == "F").count()


class TestSourceOverlapPlan:
    def test_source_overlap_hashes_corpus_once(self, spark, queries):
        """The distinct (source, digest) set feeds three consumers; it
        must be checkpointed so the corpus text is scanned and hashed
        exactly once — the un-checkpointed form re-scanned documents
        12 times in this query's static plan."""
        p = plan_of(queries["dedup_source_overlap"](spark, SF_DIR))
        assert "documents.parquet" not in p  # all consumers read the checkpoint
        assert "Scan ExistingRDD" in p or "LocalTableScan" in p or "Checkpoint" in p


class TestBm25Plan:
    def test_bm25_topk_compiles_to_take_ordered_with_no_corpus_shuffle(self, spark):
        """BM25's ranking must be TakeOrderedAndProject (per-partition
        heaps), and the corpus must never shuffle — the only exchange
        feeds the single broadcast stats row."""
        import re

        from easydb_server_spark.operators.text import bm25_rank

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        p = plan_of(bm25_rank(docs, "text", "doc_id", ["customer", "join"], topk=10))
        assert "TakeOrderedAndProject" in p
        nodes = re.findall(r"\(\d+\) (BroadcastExchange|Exchange)\b", p)
        assert nodes.count("Exchange") <= 1, p  # stats partial-agg only


def _exchange_kinds(p: str) -> list[str]:
    """Partitioning kind of every Exchange in a formatted plan (the
    kind lives on the operator's Arguments detail line, not the tree
    line)."""
    import re

    return re.findall(
        r"Arguments: (hashpartitioning|rangepartitioning|SinglePartition)", p
    )


class TestLateR10Plans:
    """Plan locks for the late-round-10 operators: the scale claims
    SCALE.md makes about them, held in CI."""

    def test_unigram_tokenize_is_broadcast_only(self, spark, queries):
        """The vocabulary-bounded collapse: distinct words fold JVM-side
        and rejoin the corpus via BroadcastHashJoin — no SortMerge, no
        Python stage anywhere (the Viterbi DP is a higher-order
        aggregate, not a UDF)."""
        p = plan_of(queries["text_unigram_tokenize"](spark, SF_DIR))
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "MapInPandas" not in p

    def test_code_fraction_rides_the_scan(self, spark, queries):
        """In-row regex filter over the line array: the only exchange
        is the final presentation sort's range partitioning — the
        signal itself is free on the first pass over the corpus."""
        p = plan_of(queries["text_code_fraction"](spark, SF_DIR))
        kinds = _exchange_kinds(p)
        assert kinds and all(k == "rangepartitioning" for k in kinds), kinds

    def test_audio_paths_are_arrow_batched_map_only(self, spark, queries):
        """G.711 transcode and signal analysis are map-only Arrow
        stages: no shuffle except the final presentation sort."""
        for name in ("multimodal_audio_g711", "multimodal_audio_analysis"):
            p = plan_of(queries[name](spark, SF_DIR))
            assert "MapInPandas" in p, name
            kinds = _exchange_kinds(p)
            assert kinds and all(k == "rangepartitioning" for k in kinds), (name, kinds)

    def test_sketch_build_is_two_phase_aggregate(self, spark, queries):
        """Sketch building must be map-side combinable: partial HLL
        aggregation (ObjectHashAggregate over the typed sketch buffer)
        below the single hash exchange."""
        p = plan_of(queries["sketch_distinct"](spark, SF_DIR))
        assert p.count("ObjectHashAggregate") >= 2  # partial + final
        kinds = _exchange_kinds(p)
        assert kinds.count("hashpartitioning") == 1, kinds
