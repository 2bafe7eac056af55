"""Cross-format consistency: the same aggregation over the same data
must agree whether the table arrives as parquet, CSV (inferred
schema), or NdJSON — exercising the reference's core premise
(files-as-tables) against the typed parquet ground truth."""

import pyspark.sql.functions as F

from tests.conftest import SF_DIR


def _agg(df):
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.min("o_orderkey").alias("first_key"),
        )
        .orderBy("o_orderstatus")
    )


def test_csv_roundtrip_matches_parquet(spark, engine, tmp_path):
    pq = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = str(tmp_path / "orders_csv")
    pq.coalesce(1).write.option("header", True).csv(out)
    import glob

    csv_file = glob.glob(f"{out}/part-*.csv")[0]

    expected = [tuple(r) for r in _agg(pq).collect()]

    # through the engine's path-as-table route (A9 + inference)
    df = engine.dataframe(f"select o_orderstatus, o_totalprice, o_orderkey from '{csv_file}'")
    got = [tuple(r) for r in _agg(df).collect()]
    assert got == expected


def test_ndjson_roundtrip_matches_parquet(spark, engine, tmp_path):
    pq = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderstatus", "o_totalprice", "o_orderkey"
    )
    out = str(tmp_path / "orders_json")
    pq.coalesce(1).write.json(out)
    import glob
    import os

    src = glob.glob(f"{out}/part-*.json")[0]
    # NdJSON routing requires a .log/.txt extension (A3)
    dst = str(tmp_path / "orders.log")
    os.rename(src, dst)

    expected = [tuple(r) for r in _agg(pq).collect()]
    df = engine.dataframe(f"select * from '{dst}'")
    got = [tuple(r) for r in _agg(df).collect()]
    assert got == expected


def test_orc_roundtrip_matches_parquet(spark, engine, tmp_path):
    """ORC (documented superset) through the path-as-table route."""
    pq = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = str(tmp_path / "orders_orc")
    pq.coalesce(1).write.orc(out)
    import glob

    orc_file = glob.glob(f"{out}/part-*.orc")[0]
    expected = [tuple(r) for r in _agg(pq).collect()]
    df = engine.dataframe(f"select * from '{orc_file}'")
    got = [tuple(r) for r in _agg(df).collect()]
    assert got == expected
