"""Bucketed-table co-located join (SCALE.md: the storage-layout answer
to the one remaining big shuffle, orders⋈lineitem).

Writing both facts bucketed by the join key lets the sort-merge join
read pre-partitioned, pre-sorted buckets — the physical plan contains
NO Exchange on either side.
"""

import contextlib
import io

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown. Also clear stale
    # locations: the in-memory catalog forgets tables across sessions
    # but their directories survive.
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # AQE hides the final plan shape pre-execution; judge the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.sql(
            """
            SELECT o.o_orderkey, COUNT(*) AS n
            FROM b_orders o JOIN b_lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey
            """
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # bucketing removes EVERY shuffle: the join reads co-located
        # buckets, and the groupBy on the same key reuses the layout
        assert "Exchange" not in plan
        # and the result is right: one row per order that has lineitems
        expected = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .select("l_orderkey")
            .distinct()
            .count()
        )
        assert df.count() == expected
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_unbucketed_same_join_does_shuffle(bucketed):
    spark = bucketed
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        df = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderkey").count()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "Exchange" in buf.getvalue()  # the shuffle bucketing removes
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
