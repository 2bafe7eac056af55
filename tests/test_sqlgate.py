"""Unit tests for the SQL gateway (SURVEY.md §5.2 item 2: A9/A11/A12)."""

import pytest

from easydb_server_spark.errors import UnsupportedSQLError
from easydb_server_spark.sqlgate import SQLType, classify, extract_table_names, rewrite_path_tables
from easydb_server_spark.sqlgate.parse import parse_create_table


class TestClassify:
    def test_select_is_dml(self):
        assert classify("SELECT * FROM t") is SQLType.DML

    def test_with_cte_is_dml(self):
        assert classify("WITH x AS (SELECT 1) SELECT * FROM x") is SQLType.DML

    def test_create_table_is_ddl(self):
        assert classify("CREATE TABLE u () LOCATION 'u.csv'") is SQLType.DDL

    @pytest.mark.parametrize(
        "sql",
        [
            "INSERT INTO t VALUES (1)",
            "UPDATE t SET a = 1",
            "DELETE FROM t",
            "DROP TABLE t",
            "EXPLAIN SELECT * FROM t",
            "SHOW TABLES",
            "CREATE VIEW v AS SELECT 1",
        ],
    )
    def test_rejections(self, sql):
        with pytest.raises(UnsupportedSQLError):
            classify(sql)

    def test_empty_rejected(self):
        with pytest.raises(UnsupportedSQLError):
            classify("   ")

    def test_case_insensitive(self):
        assert classify("select 1 from t") is SQLType.DML


class TestExtractTables:
    def test_simple(self):
        assert extract_table_names("SELECT * FROM user") == ["user"]

    def test_join_chain(self):
        sql = "SELECT * FROM a JOIN b ON a.x = b.x LEFT JOIN c ON b.y = c.y"
        assert extract_table_names(sql) == ["a", "b", "c"]

    def test_comma_list(self):
        assert extract_table_names("SELECT * FROM a, b WHERE a.x = b.x") == ["a", "b"]

    def test_aliases_not_collected(self):
        assert extract_table_names("SELECT t1.x FROM user AS t1 INNER JOIN log AS t2 ON t1.id = t2.user_id") == [
            "user",
            "log",
        ]

    def test_cte_names_excluded(self):
        sql = "WITH tot AS (SELECT x FROM base) SELECT * FROM tot JOIN other ON tot.x = other.x"
        assert extract_table_names(sql) == ["base", "other"]

    def test_derived_table(self):
        assert extract_table_names("SELECT * FROM (SELECT * FROM inner_t) d") == ["inner_t"]

    def test_where_subquery(self):
        sql = "SELECT * FROM a WHERE EXISTS (SELECT 1 FROM b WHERE b.x = a.x)"
        assert extract_table_names(sql) == ["a", "b"]

    def test_select_list_subquery(self):
        # the reference MISSES this (src/sql/parse.rs:40-53); we don't
        sql = "SELECT (SELECT max(y) FROM m) AS mx FROM a"
        assert set(extract_table_names(sql)) == {"a", "m"}

    def test_extract_from_not_a_table(self):
        sql = "SELECT EXTRACT(year FROM o_orderdate) FROM orders"
        assert extract_table_names(sql) == ["orders"]

    def test_function_args_not_tables(self):
        sql = "SELECT substr(name, 1, 2) FROM people WHERE x IN (1, 2, 3)"
        assert extract_table_names(sql) == ["people"]

    def test_union(self):
        assert extract_table_names("SELECT x FROM a UNION SELECT x FROM b") == ["a", "b"]

    def test_quoted_identifier(self):
        assert extract_table_names('SELECT * FROM "weird name"') == ["weird name"]

    def test_no_tables(self):
        assert extract_table_names("SELECT 1") == []


class TestPathRewrite:
    def test_quoted_path_rewritten(self):
        sql = "select * from '/data/order*.csv'"
        rewritten, mapping = rewrite_path_tables(sql)
        assert len(mapping) == 1
        (name, path), = mapping.items()
        assert path == "/data/order*.csv"
        assert name.startswith("temp_")
        assert rewritten == f"select * from {name}"

    def test_same_path_same_temp_name(self):
        sql = "select * from 'a.csv' t1 join 'a.csv' t2 on t1.id = t2.id"
        rewritten, mapping = rewrite_path_tables(sql)
        assert len(mapping) == 1

    def test_string_literal_not_rewritten(self):
        # naive string replace (the reference's approach) would corrupt this
        sql = "select * from 'a.csv' where name != 'a.csv'"
        rewritten, mapping = rewrite_path_tables(sql)
        assert len(mapping) == 1
        assert "'a.csv'" in rewritten  # the WHERE literal survives
        assert not rewritten.startswith("select * from 'a.csv'")

    def test_no_paths(self):
        sql = "select * from t"
        assert rewrite_path_tables(sql) == (sql, {})

    def test_bare_unquoted_path_rewritten(self):
        # the reference accepts unquoted file-path factors; Spark can't
        # register a dotted temp-view name, so these must be rewritten
        sql = "select * from user.csv"
        rewritten, mapping = rewrite_path_tables(sql)
        assert len(mapping) == 1
        (name, path), = mapping.items()
        assert path == "user.csv"
        assert rewritten == f"select * from {name}"

    def test_bare_path_in_join_and_quoted_mix(self):
        sql = "select * from user.csv u join 'order_1.csv' o on u.id = o.user_id"
        rewritten, mapping = rewrite_path_tables(sql)
        assert set(mapping.values()) == {"user.csv", "order_1.csv"}
        assert ".csv" not in rewritten.split("on")[0]

    def test_plain_table_names_untouched(self):
        sql = "select * from users join db_orders on users.id = db_orders.uid"
        assert rewrite_path_tables(sql) == (sql, {})

    def test_temp_names_unique_across_calls(self):
        names = set()
        for _ in range(50):
            _, mapping = rewrite_path_tables("select * from 'a.csv'")
            names.update(mapping)
        assert len(names) == 50  # no collisions across calls


class TestParseCreateTable:
    def test_readme_form(self):
        ct = parse_create_table("create table user () location 'example/user.csv'")
        assert ct.name == "user"
        assert ct.location == "example/user.csv"
        assert ct.columns == []

    def test_with_columns_and_comment(self):
        ct = parse_create_table(
            "CREATE TABLE t (id BIGINT COMMENT 'pk', name STRING) LOCATION 'd.csv' COMMENT 'demo'"
        )
        assert ct.location == "d.csv"
        assert ct.comment == "demo"
        assert ct.columns[0]["field"] == "id"
        assert ct.columns[0]["comment"] == "pk"
        assert ct.columns[1] == {"field": "name", "field_type": "STRING", "comment": None}

    def test_missing_location(self):
        ct = parse_create_table("CREATE TABLE t (id INT)")
        assert ct.location is None
