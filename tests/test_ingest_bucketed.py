"""Engine.ingest_bucketed: the DDL-superset ingest path that lands
fact tables bucketed, so gateway SQL gets exchange-free joins on the
bucket key (the tools/bucketize.py trade, wired into the engine)."""

import contextlib
import io
import shutil

import pytest

from tests.conftest import SF_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from easydb_server_spark.catalog import Catalog
    from easydb_server_spark.engine import Engine

    for t in ("ing_orders", "ing_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    eng = Engine(spark, Catalog(str(tmp_path / "catalog.db")))
    yield eng
    for t in ("ing_orders", "ing_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ingested_tables_join_without_exchange(engine):
    spark = engine.spark
    r1 = engine.ingest_bucketed("ing_orders", f"{SF_DIR}/orders.parquet", "o_orderkey", n_buckets=8)
    r2 = engine.ingest_bucketed("ing_lineitem", f"{SF_DIR}/lineitem.parquet", "l_orderkey", n_buckets=8)
    assert r1["rows"] == [["successful"]] and r2["n_buckets"] == 8

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # through the GATEWAY: names resolve via the metastore, so the
        # bucket spec survives and the static plan has zero Exchanges
        df = engine.dataframe(
            "SELECT o.o_orderkey, COUNT(*) AS n "
            "FROM ing_orders o JOIN ing_lineitem l ON o.o_orderkey = l.l_orderkey "
            "GROUP BY o.o_orderkey"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert "Exchange" not in plan
        # and the result matches the plain-path answer
        n = df.count()
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        expect = (
            o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderkey").count().count()
        )
        assert n == expect
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_rows_are_listed_but_never_shadowed(engine):
    engine.ingest_bucketed("ing_orders", f"{SF_DIR}/orders.parquet", "o_orderkey", n_buckets=4)
    listed = {t["table_ref"] for t in engine.catalog.list_tables()}
    assert "ing_orders" in listed
    # lookup() must NOT return it: a path re-registration would shadow
    # the metastore table with a bucketless temp view
    assert engine.catalog.lookup(["ing_orders"]) == {}
    # interactive query path works end-to-end
    body = engine.query("SELECT COUNT(*) AS n FROM ing_orders")
    assert body["rows"][0][0] != "0"
