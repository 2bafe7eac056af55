"""Differential fuzzing: hypothesis-generated ANSI SQL runs on both
Spark and DuckDB over the same parquet table; results must agree
(SURVEY.md §5.2 item 4). The generated subset is the common dialect:
projections, predicates, GROUP BY aggregates, ORDER BY, LIMIT.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from easydb_server_spark.compare import canon_frame
from tests.conftest import SF_DIR

INT_COLS = ["o_orderkey", "o_custkey"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
NUM_COLS = ["o_totalprice"]

predicates = st.one_of(
    st.tuples(st.sampled_from(INT_COLS), st.sampled_from(["<", "<=", ">", ">=", "="]), st.integers(0, 20000)).map(
        lambda t: f"{t[0]} {t[1]} {t[2]}"
    ),
    st.tuples(st.sampled_from(NUM_COLS), st.sampled_from(["<", ">"]), st.integers(1000, 400000)).map(
        lambda t: f"{t[0]} {t[1]} {t[2]}"
    ),
    st.tuples(st.sampled_from(STR_COLS), st.sampled_from(["O", "F", "P", "1-URGENT", "5-LOW"])).map(
        lambda t: f"{t[0]} = '{t[1]}'"
    ),
    st.tuples(st.sampled_from(INT_COLS), st.integers(0, 5000), st.integers(0, 15000)).map(
        lambda t: f"{t[0]} BETWEEN {min(t[1], t[2])} AND {max(t[1], t[2])}"
    ),
)

aggregates = st.sampled_from(
    [
        "COUNT(*) AS agg_val",
        "COUNT(DISTINCT o_custkey) AS agg_val",
        "MIN(o_orderkey) AS agg_val",
        "MAX(o_orderkey) AS agg_val",
        "CAST(SUM(o_orderkey) AS BIGINT) AS agg_val",
        "ROUND(SUM(o_totalprice), 1) AS agg_val",
        "ROUND(MIN(o_totalprice), 4) AS agg_val",
    ]
)


@st.composite
def sql_queries(draw):
    preds = draw(st.lists(predicates, min_size=0, max_size=3))
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    if draw(st.booleans()):
        group = draw(st.sampled_from(STR_COLS))
        agg = draw(aggregates)
        return (
            f"SELECT {group}, {agg} FROM orders{where} "
            f"GROUP BY {group} ORDER BY {group}"
        )
    cols = draw(st.lists(st.sampled_from(INT_COLS + STR_COLS), min_size=1, max_size=3, unique=True))
    limit = draw(st.integers(1, 500))
    return (
        f"SELECT {', '.join(cols)} FROM orders{where} "
        f"ORDER BY {', '.join(INT_COLS)} LIMIT {limit}"
    )


@pytest.fixture(scope="module")
def engines(spark):
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView("orders")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    return spark, con


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sql=sql_queries())
def test_spark_matches_duckdb(engines, sql):
    spark, con = engines
    scols, srows = canon_frame(spark.sql(sql).toPandas())
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols, sql
    assert srows == orows, f"{sql}\nspark={srows[:3]}\noracle={orows[:3]}"


@st.composite
def window_queries(draw):
    """Window-function templates over a deterministic tiebreak order."""
    part = draw(st.sampled_from(STR_COLS))
    fn = draw(
        st.sampled_from(
            [
                "ROW_NUMBER() OVER w",
                "RANK() OVER w",
                "DENSE_RANK() OVER w",
                "LAG(o_orderkey, 1, -1) OVER w",
                "LEAD(o_orderkey, 2, -2) OVER w",
                "CAST(SUM(o_orderkey) OVER (PARTITION BY {p} ORDER BY o_orderkey "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
                "MIN(o_orderkey) OVER w",
                "NTILE(3) OVER w",
            ]
        )
    ).replace("{p}", part)
    cutoff = draw(st.integers(100, 3000))
    return (
        f"SELECT o_orderkey, {part}, {fn} AS wv FROM orders "
        f"WHERE o_orderkey <= {cutoff} "
        f"WINDOW w AS (PARTITION BY {part} ORDER BY o_orderkey) "
        f"ORDER BY o_orderkey"
    )


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sql=window_queries())
def test_window_functions_match_duckdb(engines, sql):
    spark, con = engines
    scols, srows = canon_frame(spark.sql(sql).toPandas())
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols, sql
    assert srows == orows, f"{sql}\nspark={srows[:3]}\noracle={orows[:3]}"
