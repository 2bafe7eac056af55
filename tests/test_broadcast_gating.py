"""Broadcast gating — the 100 TB safety property VERDICT r2 demanded.

Only bounded dims (nation = 25 rows, region = 5) carry an explicit
``F.broadcast`` hint. SF-proportional tables (customer/supplier/part)
are unhinted, so:

- at bench scale Spark's size estimate still picks BroadcastHashJoin
  (the filtered side is far under ``autoBroadcastJoinThreshold``), and
- past the threshold the plan DEGRADES to SortMergeJoin instead of
  attempting an unbounded broadcast that dies at the 8 GB hard limit
  (reproduced here with ``autoBroadcastJoinThreshold=-1``).
"""

import contextlib
import io

import pytest

from tests.conftest import SF_DIR


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_auto_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def queries():
    from easydb_server_spark.queries import spark_queries

    return spark_queries()


class TestBroadcastGating:
    def test_small_scale_still_broadcasts_unhinted_tables(self, spark, queries):
        """At test scale the size estimate alone must choose
        BroadcastHashJoin for every TPC-H join — no hint needed."""
        for name in ["tpch_q3", "tpch_q10", "tpch_q14", "tpch_q19"]:
            p = plan_of(queries[name](spark, SF_DIR))
            assert "BroadcastHashJoin" in p, name
            assert "SortMergeJoin" not in p, name

    def test_big_side_degrades_to_sort_merge_not_forced_broadcast(
        self, spark, queries, no_auto_broadcast
    ):
        """With the threshold off (proxy for 'side exceeds the limit'),
        unhinted joins must fall back to SortMergeJoin — proving no
        forced broadcast remains on SF-proportional tables."""
        for name in ["tpch_q3", "tpch_q14", "tpch_q19", "tpch_q18"]:
            p = plan_of(queries[name](spark, SF_DIR))
            assert "SortMergeJoin" in p, name
            assert "BroadcastHashJoin" not in p, name

    def test_bounded_dims_keep_their_hint_past_threshold(
        self, spark, queries, no_auto_broadcast
    ):
        """nation/region hints survive the threshold (they're genuinely
        bounded: 25/5 rows at EVERY scale factor), while the customer
        join in the same query degrades to SortMergeJoin."""
        p = plan_of(queries["join_inner_revenue"](spark, SF_DIR))
        assert "BroadcastHashJoin" in p  # nation/region, hinted
        assert "SortMergeJoin" in p  # customer⋈orders and orders⋈lineitem, unhinted

    def test_q7_supplier_customer_unhinted(self, spark, queries, no_auto_broadcast):
        """Q7's supplier and customer joins (SF-proportional) degrade;
        its two nation-role joins stay broadcast."""
        p = plan_of(queries["tpch_q7"](spark, SF_DIR))
        assert "SortMergeJoin" in p
        assert "BroadcastHashJoin" in p  # the two hinted nation dims
