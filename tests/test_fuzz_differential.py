"""Differential fuzzing: hypothesis-generated ANSI SQL runs on both
Spark and DuckDB over the same parquet table; results must agree
(SURVEY.md §5.2 item 4). The generated subset is the common dialect:
projections, predicates, GROUP BY aggregates, ORDER BY, LIMIT,
windows, joins, set operations, HAVING, and — r8 — randomly NESTED
query trees (`query_trees`) composing all of the above to depth 2.
Relational case budget across the strategies: 30 + 20 + 20 + 25 + 25 +
25 + 60 = 205 examples per run (≥200, the r7 verdict's ask), plus the
operator-geometry fuzzes (chunking, packing, caps, n-gram spans,
resampling, BM25, and — r8 — DSIR params and Gopher-rule thresholds)
below.
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
    spark.read.parquet(f"{SF_DIR}/customer.parquet").createOrReplaceTempView("customer")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'")
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


@st.composite
def join_queries(draw):
    """Join-shape templates: random join type + predicates, grouped or
    top-k projected. ORDER BY o_orderkey (unique, never null from the
    orders side) keeps LIMIT deterministic under both engines' null
    orderings."""
    how = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    preds = draw(st.lists(predicates, min_size=0, max_size=2))
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    if draw(st.booleans()):
        return (
            f"SELECT c_mktsegment, COUNT(*) AS agg_val, "
            f"CAST(SUM(o_orderkey) AS BIGINT) AS agg_sum "
            f"FROM orders {how} customer ON o_custkey = c_custkey{where} "
            f"GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST"
        )
    limit = draw(st.integers(1, 300))
    return (
        f"SELECT o_orderkey, o_custkey, c_name, c_mktsegment "
        f"FROM orders {how} customer ON o_custkey = c_custkey{where} "
        f"ORDER BY o_orderkey LIMIT {limit}"
    )


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sql=join_queries())
def test_joins_match_duckdb(engines, sql):
    spark, con = engines
    scols, srows = canon_frame(spark.sql(sql).toPandas())
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols, sql
    assert srows == orows, f"{sql}\nspark={srows[:3]}\noracle={orows[:3]}"


@st.composite
def scalar_fn_queries(draw):
    """Common-dialect scalar string/number expressions over customer."""
    i = draw(st.integers(1, 5))
    j = draw(st.integers(1, 8))
    n = draw(st.integers(1, 20))
    expr = draw(
        st.sampled_from(
            [
                "upper(c_name)",
                "lower(c_mktsegment)",
                f"substr(c_name, {i}, {j})",
                "CAST(length(c_name) AS INT)",
                "concat(c_name, '_', c_mktsegment)",
                "trim(c_name)",
                "replace(c_name, 'e', 'X')",
                f"lpad(c_name, {n}, '*')",
                f"rpad(c_mktsegment, {n}, '.')",
                "reverse(c_name)",
                "CAST(ascii(c_mktsegment) AS INT)",
                "left(c_name, 3)",
                # NOTE: round(double, 1) deliberately absent — 2dp money
                # values sit on the .05 boundary where Spark's
                # BigDecimal HALF_UP and DuckDB's float rounding differ
                "CAST(abs(c_acctbal) AS DOUBLE)",
                "CAST(floor(c_acctbal) AS DOUBLE)",
                "CAST(ceil(c_acctbal) AS DOUBLE)",
            ]
        )
    )
    cutoff = draw(st.integers(10, 2000))
    return (
        f"SELECT c_custkey, {expr} AS v FROM customer "
        f"WHERE c_custkey <= {cutoff} ORDER BY c_custkey"
    )


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sql=scalar_fn_queries())
def test_scalar_functions_match_duckdb(engines, sql):
    spark, con = engines
    scols, srows = canon_frame(spark.sql(sql).toPandas())
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols, sql
    assert srows == orows, f"{sql}\nspark={srows[:3]}\noracle={orows[:3]}"


@st.composite
def setop_queries(draw):
    """Two generated branches over orders glued by a set operation —
    the branch predicates come from the same strategy as the core
    fuzz, so the interesting surface is the set-op semantics
    (bag vs set, ALL multiplicity) across engines."""
    op = draw(st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]))
    cols = draw(st.lists(st.sampled_from(INT_COLS + STR_COLS), min_size=1, max_size=2, unique=True))
    col_list = ", ".join(cols)
    p1 = draw(predicates)
    p2 = draw(predicates)
    return (
        f"SELECT {col_list} FROM orders WHERE {p1} "
        f"{op} "
        f"SELECT {col_list} FROM orders WHERE {p2} "
        f"ORDER BY {col_list}"
    )


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sql=setop_queries())
def test_set_operations_match_duckdb(engines, sql):
    spark, con = engines
    scols, srows = canon_frame(spark.sql(sql).toPandas())
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols, sql
    assert srows == orows, f"{sql}\nspark={srows[:3]}\noracle={orows[:3]}"


@st.composite
def having_queries(draw):
    """GROUP BY + HAVING over generated thresholds: the HAVING
    predicate references the aggregate, exercising post-aggregation
    filtering and its integer/decimal comparison semantics."""
    group = draw(st.sampled_from(STR_COLS))
    n = draw(st.integers(0, 5000))
    preds = draw(st.lists(predicates, min_size=0, max_size=2))
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    having = draw(
        st.sampled_from(
            [
                f"COUNT(*) > {n}",
                f"COUNT(DISTINCT o_custkey) >= {n}",
                f"MIN(o_orderkey) < {n * 10}",
            ]
        )
    )
    return (
        f"SELECT {group}, COUNT(*) AS agg_val FROM orders{where} "
        f"GROUP BY {group} HAVING {having} ORDER BY {group}"
    )


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sql=having_queries())
def test_having_matches_duckdb(engines, sql):
    spark, con = engines
    scols, srows = canon_frame(spark.sql(sql).toPandas())
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols, sql
    assert srows == orows, f"{sql}\nspark={srows[:3]}\noracle={orows[:3]}"


@st.composite
def query_trees(draw, depth: int = 2):
    """Random relational TREES (r7 verdict ask #8): nested derived
    tables composing filters, projections, aggregates, joins, and set
    operations to random depth — not just the flat one-level templates
    above. Every subtree exposes the same (k BIGINT, s VARCHAR,
    v DOUBLE) contract so any node composes over any subtree; value
    columns pass through or aggregate with order-independent exact
    functions (COUNT/MIN/MAX, integer SUM) so cross-engine float
    summation order can never produce spurious diffs — disagreements
    are genuine semantic divergence.
    """
    if depth == 0 or draw(st.integers(0, 3)) == 0:
        # leaf: filtered projection of a base table onto the contract
        if draw(st.booleans()):
            pred = draw(predicates)
            return (
                "SELECT o_orderkey AS k, o_orderpriority AS s, "
                f"o_totalprice AS v FROM orders WHERE {pred}"
            )
        cutoff = draw(st.integers(10, 3000))
        return (
            "SELECT c_custkey AS k, c_mktsegment AS s, c_acctbal AS v "
            f"FROM customer WHERE c_custkey <= {cutoff}"
        )
    kind = draw(st.sampled_from(["filter", "agg", "join", "setop"]))
    a = draw(query_trees(depth=depth - 1))
    if kind == "filter":
        n = draw(st.integers(0, 20000))
        op = draw(st.sampled_from(["<", ">=", "<>"]))
        return f"SELECT k, s, v FROM ({a}) t WHERE k {op} {n}"
    if kind == "agg":
        m = draw(st.integers(2, 50))
        agg = draw(
            st.sampled_from(
                [
                    "CAST(COUNT(*) AS DOUBLE)",
                    "CAST(COUNT(DISTINCT k) AS DOUBLE)",
                    "MIN(v)",
                    "MAX(v)",
                    "CAST(CAST(SUM(k) AS BIGINT) AS DOUBLE)",
                ]
            )
        )
        return (
            f"SELECT k % {m} AS k, s, {agg} AS v FROM ({a}) t "
            f"GROUP BY k % {m}, s"
        )
    b = draw(query_trees(depth=depth - 1))
    if kind == "join":
        how = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
        side = draw(st.sampled_from(["a.s", "b.s"]))
        return (
            f"SELECT a.k AS k, {side} AS s, a.v AS v "
            f"FROM ({a}) a {how} ({b}) b ON a.k = b.k"
        )
    op = draw(st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]))
    return f"({a}) {op} ({b})"


@settings(
    max_examples=60, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
@given(sql=query_trees())
def test_query_trees_match_duckdb(engines, sql):
    """≥200 relational differential cases across this file's
    strategies; this one contributes the nested-tree shapes. The
    comparator is order-insensitive, so trees need no total ORDER BY —
    full result sets compare."""
    spark, con = engines
    wrapped = f"SELECT k, s, v FROM ({sql}) q"
    scols, srows = canon_frame(spark.sql(wrapped).toPandas())
    ocols, orows = canon_frame(con.execute(wrapped).df())
    assert scols == ocols, wrapped
    assert srows == orows, f"{wrapped}\nspark={srows[:3]}\noracle={orows[:3]}"


@st.composite
def chunk_params(draw):
    chunk_size = draw(st.integers(2, 64))
    overlap = draw(st.integers(0, chunk_size - 1))
    return chunk_size, overlap


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(params=chunk_params())
def test_chunking_matches_duckdb_for_any_geometry(engines_docs, params):
    """chunk_documents vs a parameterized DuckDB replay across random
    (chunk_size, overlap) geometries — the 1-based-inclusive list
    slicing and the ceil-division chunk count are the two places a
    fence-post error would hide."""
    chunk_size, overlap = params
    spark, con, docs = engines_docs
    from easydb_server_spark.compare import canon_frame
    from easydb_server_spark.operators.text import chunk_documents

    stride = chunk_size - overlap
    sdf = (
        chunk_documents(docs, "text", "doc_id", chunk_size=chunk_size, overlap=overlap)
        .orderBy("doc_id", "chunk_id")
        .toPandas()
    )
    sql = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM docs50),
    c AS (
      SELECT doc_id, ws,
             UNNEST(generate_series(0, CAST(GREATEST(CEIL((len(ws) - {chunk_size}) / {stride}.0), 0) AS INT)))
               AS chunk_id
      FROM t
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(ws[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk_size}]) AS INT) AS n_tokens,
           array_to_string(ws[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk_size}], ' ') AS chunk
    FROM c ORDER BY doc_id, chunk_id
    """
    scols, srows = canon_frame(sdf)
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols, params
    assert srows == orows, f"chunk_size={chunk_size} overlap={overlap}"


@pytest.fixture(scope="module")
def engines_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where("doc_id < 50").select(
        "doc_id", "text"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs50 AS SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' WHERE doc_id < 50"
    )
    return spark, con, docs


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cap=st.integers(1, 30))
def test_source_cap_matches_duckdb_for_any_cap(engines_docs_src, cap):
    """source_cap vs a DuckDB ROW_NUMBER replay across random caps —
    the md5 rank key and the tie-break must agree exactly for the kept
    set to be engine-portable."""
    spark, con, docs = engines_docs_src
    from easydb_server_spark.compare import canon_frame
    from easydb_server_spark.operators.text import source_cap

    sdf = (
        source_cap(docs, "doc_id", "source", cap=cap)
        .select("doc_id", "source", "cap_rank")
        .orderBy("doc_id")
        .toPandas()
    )
    sql = f"""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('cap1:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
             ) AS cap_rank
      FROM docs_src
    )
    SELECT doc_id, source, CAST(cap_rank AS INT) AS cap_rank
    FROM ranked WHERE cap_rank <= {cap} ORDER BY doc_id
    """
    scols, srows = canon_frame(sdf)
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols
    assert srows == orows, f"cap={cap}"


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n=st.integers(2, 8), min_docs=st.integers(2, 4))
def test_ngram_spans_match_duckdb_for_any_geometry(engines_docs, n, min_docs):
    """duplicate_ngram_spans vs a DuckDB replay across random
    (n, min_docs) — position indexing and the len(ws) >= n boundary
    are where fence-post errors would hide."""
    spark, con, docs = engines_docs
    from easydb_server_spark.compare import canon_frame
    from easydb_server_spark.operators.dedup import duplicate_ngram_spans

    sdf = (
        duplicate_ngram_spans(docs, "text", "doc_id", n=n, min_docs=min_docs)
        .select("doc_id", "pos", "gram_hash", "n_docs")
        .orderBy("doc_id", "pos")
        .toPandas()
    )
    sql = f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM docs50),
    g AS (
      SELECT doc_id, t.i AS pos, array_to_string(ws[t.i + 1 : t.i + {n}], ' ') AS gram
      FROM w, UNNEST(generate_series(0, len(ws) - {n})) t(i)
      WHERE len(ws) >= {n}
    ),
    h AS (
      SELECT doc_id, pos, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gram_hash FROM g
    ),
    c AS (SELECT gram_hash, COUNT(DISTINCT doc_id) AS n_docs FROM h GROUP BY gram_hash)
    SELECT h.doc_id, CAST(h.pos AS INT) AS pos, h.gram_hash,
           CAST(c.n_docs AS BIGINT) AS n_docs
    FROM h JOIN c USING (gram_hash) WHERE c.n_docs >= {min_docs}
    ORDER BY h.doc_id, h.pos
    """
    scols, srows = canon_frame(sdf)
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols
    assert srows == orows, f"n={n} min_docs={min_docs}"


@pytest.fixture(scope="module")
def engines_docs_src(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where("doc_id < 120").select(
        "doc_id", "source"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs_src AS SELECT doc_id, source FROM '{SF_DIR}/documents.parquet' WHERE doc_id < 120"
    )
    return spark, con, docs


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(budget=st.integers(16, 1024))
def test_packing_matches_duckdb_for_any_budget(engines_docs_pack, budget):
    """pack_sequences vs a DuckDB cumulative-window replay across
    random token budgets — the boundary rule (a crossing document
    stays in the earlier bin) must agree for every budget."""
    spark, con, docs = engines_docs_pack
    from easydb_server_spark.compare import canon_frame
    from easydb_server_spark.operators.text import pack_sequences

    sdf = (
        pack_sequences(docs, "text", "doc_id", "source", token_budget=budget)
        .orderBy("grp", "bin")
        .toPandas()
    )
    sql = f"""
    WITH t AS (
      SELECT source AS grp, doc_id AS doc, len(string_split(text, ' ')) AS n_tokens
      FROM docs_pack
    ),
    b AS (
      SELECT grp, doc, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY grp ORDER BY doc
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                        / {budget}.0) AS BIGINT) AS bin
      FROM t
    )
    SELECT grp, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc) AS first_doc, MAX(doc) AS last_doc
    FROM b GROUP BY grp, bin ORDER BY grp, bin
    """
    scols, srows = canon_frame(sdf)
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols
    assert srows == orows, f"budget={budget}"


@pytest.fixture(scope="module")
def engines_docs_pack(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where("doc_id < 150").select(
        "doc_id", "text", "source"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs_pack AS SELECT doc_id, text, source FROM '{SF_DIR}/documents.parquet' WHERE doc_id < 150"
    )
    return spark, con, docs


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(step=st.sampled_from(["30 minutes", "1 hour", "2 hours", "5 hours"]))
def test_resample_locf_matches_duckdb_for_any_step(engines_events, step):
    """resample_locf vs the DuckDB window replay across grid steps —
    the grid generation and the at-or-before fill must agree for any
    step size."""
    spark, con, events = engines_events
    import pyspark.sql.functions as F

    from easydb_server_spark.compare import canon_frame
    from easydb_server_spark.operators.resample import resample_locf

    sdf = (
        resample_locf(events, "ts", "user_id", "value", step=step)
        .select("user_id", F.col("grid_ts").cast("string").alias("grid_ts"), "value_locf")
        .orderBy("user_id", "grid_ts")
        .toPandas()
    )
    sql = f"""
    WITH ev AS (SELECT user_id AS k, ts, value FROM ev3),
    b AS (SELECT date_trunc('hour', MIN(ts)) AS t0, date_trunc('hour', MAX(ts)) AS t1 FROM ev),
    keys AS (SELECT DISTINCT k FROM ev),
    grid AS (SELECT k, UNNEST(generate_series(t0, t1, INTERVAL {step})) AS gts FROM keys, b),
    u AS (
      SELECT k, ts AS gts, CAST(value AS DOUBLE) AS v, 0 AS is_grid FROM ev
      UNION ALL SELECT k, gts, NULL, 1 FROM grid
    ),
    f AS (
      SELECT k, gts, is_grid,
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY gts, is_grid, v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
      FROM u
    )
    SELECT k AS user_id, CAST(gts AS VARCHAR) AS grid_ts, ROUND(value_locf, 2) AS value_locf
    FROM f WHERE is_grid = 1 ORDER BY user_id, grid_ts
    """
    scols, srows = canon_frame(sdf)
    ocols, orows = canon_frame(con.execute(sql).df())
    assert scols == ocols
    assert srows == orows, f"step={step}"


@pytest.fixture(scope="module")
def engines_events(spark):
    from easydb_server_spark.queries._util import load

    events = load(spark, SF_DIR, "events").where("user_id < 3").select("user_id", "ts", "value")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW ev3 AS SELECT user_id, ts, value FROM '{SF_DIR}/events.parquet' WHERE user_id < 3"
    )
    return spark, con, events


@pytest.fixture(scope="module")
def engines_docs_bm25(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where("doc_id < 50").select(
        "doc_id", "text"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' WHERE doc_id < 50"
    )
    return spark, con, docs


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    terms=st.lists(
        st.sampled_from(
            ["customer", "join", "vector", "hash", "row", "scan", "merge", "zzz_absent"]
        ),
        min_size=1,
        max_size=4,
        unique=True,
    ),
    kb=st.sampled_from([(1.2, 0.75), (1.5, 0.75), (0.9, 0.4), (2.0, 1.0), (1.2, 0.0)]),
)
def test_bm25_matches_duckdb_for_any_query(engines_docs_bm25, terms, kb):
    """bm25_rank vs the generated DuckDB oracle across random term sets
    (including a zero-df term — idf must stay finite and the term
    contribute 0) and (k1, b) corners (b=0 disables length norm, b=1
    full norm) — the float-expression ordering and repr-interpolated
    constants must agree bit-for-bit everywhere, not just at the
    conformance point."""
    k1, b = kb
    spark, con, docs = engines_docs_bm25
    from easydb_server_spark.operators.text import bm25_rank
    from easydb_server_spark.queries.llmops import _oracle_bm25

    sdf = bm25_rank(docs, "text", "doc_id", terms, k1=k1, b=b, topk=20).toPandas()
    odf = con.execute(_oracle_bm25(terms, k1=k1, b=b, topk=20)).df()
    scols, srows = canon_frame(sdf)
    ocols, orows = canon_frame(odf)
    assert scols == ocols, (terms, kb)
    assert srows == orows, (terms, kb)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    # 10⁶ exercises the r9 de-cliffed totals path (distributed agg +
    # broadcast cross-join instead of a single-partition window) at a
    # dial where the old form would have single-threaded
    nb=st.sampled_from([64, 512, 4096, 10_000, 1_000_000]),
    seed=st.sampled_from(["dsir1", "a", "zz9"]),
    k=st.integers(3, 40),
    temp=st.sampled_from([0.5, 1.0, 2.0]),
)
def test_dsir_matches_duckdb_for_any_params(engines_docs_src_text, nb, seed, k, temp):
    """dsir_select vs the parameterized DuckDB oracle across random
    (n_buckets, seed, k, temperature) — hashing-mod arithmetic,
    smoothing denominators, and the Gumbel key derivation must agree
    everywhere, not just at the conformance point."""
    spark, con, docs = engines_docs_src_text
    import pyspark.sql.functions as F

    from easydb_server_spark.compare import canon_frame
    from easydb_server_spark.operators.text import dsir_select
    from easydb_server_spark.queries.llmops import _oracle_dsir

    target = docs.where(F.col("source") == "src0").select("doc_id", "text")
    raw = docs.where(F.col("source") != "src0").select("doc_id", "text")
    sdf = dsir_select(
        raw, target, "text", "doc_id", k=k, n_buckets=nb, seed=seed, temperature=temp
    ).toPandas()
    odf = con.execute(_oracle_dsir(nb, seed, k, temp)).df()
    scols, srows = canon_frame(sdf)
    ocols, orows = canon_frame(odf)
    assert scols == ocols, (nb, seed, k, temp)
    assert srows == orows, (nb, seed, k, temp)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    min_words=st.integers(5, 120),
    min_stop=st.integers(0, 4),
    max_symbol=st.sampled_from([0.02, 0.1, 0.5]),
    min_alpha=st.sampled_from([0.5, 0.8, 0.95]),
)
def test_gopher_rules_match_duckdb_for_any_thresholds(
    engines_docs_src_text, min_words, min_stop, max_symbol, min_alpha
):
    """gopher_rules vs the parameterized oracle across random
    thresholds — the boolean boundaries (>=, <=, strict <) must agree
    exactly on both engines for every dial setting."""
    spark, con, docs = engines_docs_src_text
    from easydb_server_spark.compare import canon_frame
    from easydb_server_spark.operators.text import gopher_rules
    from easydb_server_spark.queries.llmops import _oracle_gopher

    sdf = (
        gopher_rules(
            docs.select("doc_id", "text"),
            "text",
            "doc_id",
            min_words=min_words,
            min_stopwords=min_stop,
            max_symbol_ratio=max_symbol,
            min_alpha_frac=min_alpha,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    odf = con.execute(
        _oracle_gopher(
            min_words=min_words, min_stop=min_stop, max_symbol=max_symbol, min_alpha=min_alpha
        )
    ).df()
    scols, srows = canon_frame(sdf)
    ocols, orows = canon_frame(odf)
    assert scols == ocols, (min_words, min_stop)
    assert srows == orows, (min_words, min_stop, max_symbol, min_alpha)


@pytest.fixture(scope="module")
def engines_docs_src_text(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, source, text FROM '{SF_DIR}/documents.parquet'"
    )
    return spark, con, docs
