"""End-to-end engine lifecycle — the README scenario (SURVEY.md §5.2
item 3) plus the quirk/parity behaviors."""

import pytest

from easydb_server_spark.errors import EmptyTableNameError, UnsupportedSQLError


class TestReadmeScenario:
    """FIXTURES.md group 1: the reference's own documented queries."""

    def test_glob_path_as_table(self, engine, data_dir):
        out = engine.query(f"select * from '{data_dir}/order_*.csv'")
        assert out["sql_type"] == "DML"
        assert out["header"] == ["id", "user_id", "product_name"]
        assert len(out["rows"]) == 4

    def test_create_table_then_join(self, engine, data_dir):
        r1 = engine.query("create table user () location 'user.csv'")
        assert r1 == {
            "header": ["summary"],
            "rows": [["successful"]],
            "sql_type": "DDL",
            "query_time": r1["query_time"],
        }
        engine.query("create table log () location 'events_2025*.log'")
        out = engine.query(
            "select * from user as t1 inner join log as t2 on (t1.id = t2.user_id)"
        )
        assert len(out["rows"]) == 3  # 101 matches twice, 102 once

    def test_relative_path_resolution(self, engine, data_dir):
        engine.query("create table user () location 'user.csv'")
        out = engine.query("select count(*) as n from user")
        assert out["rows"] == [["3"]]

    def test_concurrent_path_queries_no_crosstalk(self, engine, data_dir):
        """Concurrent /fetch-style queries registering different path
        tables on the shared session must never read each other's file
        (the reference's second-granularity temp names can collide;
        ours are process-unique)."""
        import threading

        results: dict[int, int] = {}
        errors: list[Exception] = []

        def worker(idx: int, path: str, want: int):
            try:
                out = engine.query(f"select * from '{path}'")
                results[idx] = (len(out["rows"]), want)
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)

        jobs = []
        for i in range(8):
            path, want = [("user.csv", 3), ("order_1.csv", 2)][i % 2]
            jobs.append(threading.Thread(target=worker, args=(i, path, want)))
        for t in jobs:
            t.start()
        for t in jobs:
            t.join(timeout=120)
        assert not errors
        assert len(results) == 8
        assert all(got == want for got, want in results.values())

    def test_bare_unquoted_path_as_table(self, engine, data_dir):
        """Reference parity: `FROM user.csv` without quotes reads the
        file (`src/data_source/context.rs:94-101`)."""
        out = engine.query("select * from user.csv")
        assert out["sql_type"] == "DML"
        assert out["header"] == ["id", "user_name", "email"]
        assert len(out["rows"]) == 3

    def test_bare_unquoted_glob_join(self, engine, data_dir):
        out = engine.query(
            "select u.user_name, o.product_name from user.csv u "
            "join order_1.csv o on u.id = o.user_id order by o.id"
        )
        assert out["rows"] == [["John Doe", "Apple"], ["Jane Roe", "Banana"]]


class TestParityBehaviors:
    def test_implicit_limit_200(self, engine):
        out = engine.query("select * from '/root/testdata/sf0.001/lineitem.parquet'")
        assert len(out["rows"]) == 200  # A13

    def test_empty_from_rejected(self, engine):
        with pytest.raises(EmptyTableNameError, match="Table name is empty"):
            engine.query("SELECT 1")  # A23

    def test_write_statements_rejected(self, engine):
        with pytest.raises(UnsupportedSQLError):
            engine.query("DROP TABLE user")  # A12

    def test_ddl_requires_location(self, engine):
        with pytest.raises(UnsupportedSQLError, match="LOCATION"):
            engine.query("CREATE TABLE t (id INT)")  # A14

    def test_nulls_render_as_null_string(self, engine, data_dir):
        engine.query("create table user () location 'user.csv'")
        out = engine.query("select nullif(id, 101) as maybe from user order by id")
        assert out["rows"][0] == ["null"]  # A15

    def test_failed_query_recorded_in_history(self, engine, data_dir):
        engine.query("create table user () location 'user.csv'")
        with pytest.raises(Exception):
            engine.query("select definitely_not_a_column from user")
        statuses = [h["status"] for h in engine.catalog.history()]
        assert "fail" in statuses  # A20

    def test_temp_table_recorded_in_catalog(self, engine, data_dir):
        engine.query(f"select * from '{data_dir}/user.csv'")
        # TEMP rows exist but are hidden from the listing (A9/A19)
        assert engine.catalog.list_tables() == []
        with engine.catalog._conn() as conn:
            n = conn.execute("SELECT count(*) FROM catalog WHERE type='TEMP'").fetchone()[0]
        assert n == 1

    def test_catalog_registration_is_lazy(self, engine):
        # DDL against a nonexistent path succeeds — nothing is read (§3.2)
        out = engine.query("create table ghost () location 'missing.csv'")
        assert out["rows"] == [["successful"]]

    def test_export_csv_roundtrip(self, engine, data_dir, tmp_path):
        engine.query("create table user () location 'user.csv'")
        path = engine.export("select id, user_name from user order by id", "csv")
        text = open(path).read()
        assert text.splitlines()[0] == "id,user_name"
        assert len(text.splitlines()) == 4  # header + 3 (uncapped)

    def test_export_tsv_actually_tab_delimited(self, engine, data_dir):
        # documented deviation from the reference's comma-in-.tsv bug
        engine.query("create table user () location 'user.csv'")
        path = engine.export("select id, user_name from user order by id", "tsv")
        assert "\t" in open(path).read().splitlines()[0]

    def test_export_ndjson(self, engine, data_dir):
        engine.query("create table user () location 'user.csv'")
        path = engine.export("select id from user order by id", "json")
        lines = open(path).read().splitlines()
        assert len(lines) == 3
        assert lines[0] == '{"id":101}'

    def test_datafusion_dialect_spellings_work(self, engine, data_dir):
        # shims registered at Engine init: DataFusion function names run
        engine.query("create table user () location 'user.csv'")
        out = engine.query("select strpos(user_name, 'oe') as p from user order by id")
        assert out["rows"][0] == ["7"]  # 'John Doe' → 'oe' starts at 7

    def test_export_large_result_streams_without_driver_frame(self, spark, tmp_path, monkeypatch):
        """>10⁶-row export through the single-file path: executors
        format part-files, the driver only stream-concatenates — no
        toPandas of the whole result (would be ~large on a real
        export; here we assert correctness of the streamed assembly)."""
        import os

        from easydb_server_spark import export as ex

        monkeypatch.setattr(ex, "EXPORT_DIR", str(tmp_path))
        df = spark.range(1_200_000).selectExpr("id", "id * 2 as dbl")
        path = ex.export_query(df.orderBy("id"), "csv")
        with open(path) as f:
            header = f.readline().strip()
            n = sum(1 for _ in f)
            assert header == "id,dbl"
        assert n == 1_200_000
        # ordered input concatenates back in order
        with open(path) as f:
            f.readline()
            first = f.readline().strip()
        assert first == "0,0"
        assert not os.path.isdir(path + ".parts")  # scratch dir cleaned

    def test_export_ndjson_keeps_null_fields(self, spark, tmp_path, monkeypatch):
        """NdJSON rows must carry every column even when null (stable
        key set per record, matching the round-1 pandas writer)."""
        import json as _json

        from easydb_server_spark import export as ex

        monkeypatch.setattr(ex, "EXPORT_DIR", str(tmp_path))
        df = spark.createDataFrame([(1, None), (2, "x")], "id int, v string")
        path = ex.export_query(df.orderBy("id"), "json")
        lines = [_json.loads(line) for line in open(path).read().splitlines()]
        assert lines[0] == {"id": 1, "v": None}
        assert lines[1] == {"id": 2, "v": "x"}

    def test_export_csv_header_quotes_special_column_names(self, spark, tmp_path, monkeypatch):
        """A column alias containing the delimiter must be quoted in
        the hand-written header line, same rules as the body."""
        from easydb_server_spark import export as ex

        monkeypatch.setattr(ex, "EXPORT_DIR", str(tmp_path))
        df = spark.createDataFrame([(1,)], "x int").selectExpr("x AS `a,b`")
        path = ex.export_query(df, "csv")
        assert open(path).read().splitlines()[0] == '"a,b"'

    def test_export_csv_body_quotes_rfc4180_doubled(self, spark, tmp_path, monkeypatch):
        """Body cells containing a literal quote use RFC-4180 doubling
        (escape='\"'), matching the hand-written header's convention —
        one file, one quoting dialect (ADVICE r2)."""
        from easydb_server_spark import export as ex

        monkeypatch.setattr(ex, "EXPORT_DIR", str(tmp_path))
        df = spark.createDataFrame([(1, 'say "hi", ok')], "id int, msg string")
        path = ex.export_query(df, "csv")
        body = open(path).read().splitlines()[1]
        assert body == '1,"say ""hi"", ok"'

    def test_export_guard_detects_missing_part_files(self, spark, tmp_path, monkeypatch):
        """If the driver's glob finds no part-files for a non-empty
        result (multi-node cluster without a shared FS), the export
        must fail loudly, not emit a header-only file (ADVICE r2)."""
        import glob as _g

        import pytest as _pytest

        from easydb_server_spark import export as ex

        monkeypatch.setattr(ex, "EXPORT_DIR", str(tmp_path))
        monkeypatch.setattr(ex._glob, "glob", lambda pattern: [])
        df = spark.createDataFrame([(1,)], "id int")
        with _pytest.raises(RuntimeError, match="distributed=True"):
            ex.export_query(df, "csv")
        monkeypatch.setattr(ex._glob, "glob", _g.glob)
        # empty results still export fine through the guard
        empty = spark.createDataFrame([], "id int")
        path = ex.export_query(empty, "csv")
        assert open(path).read().splitlines() == ["id"]

    def test_export_distributed_part_files(self, engine, data_dir):
        # cluster path: a directory of part files written in parallel
        from easydb_server_spark.export import export_query

        engine.query("create table user () location 'user.csv'")
        df = engine.dataframe("select id, user_name from user")
        out = export_query(df, "csv", distributed=True)
        import glob as g
        import os

        assert os.path.isdir(out)
        parts = g.glob(f"{out}/part-*.csv")
        assert parts
        rows = sum(len(open(p).read().splitlines()) - 1 for p in parts if open(p).read())
        assert rows == 3
