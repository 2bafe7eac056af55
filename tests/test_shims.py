"""DataFusion→Spark dialect shims (SQL-expression macros)."""

import pytest


@pytest.fixture(scope="module", autouse=True)
def shims(spark):
    from easydb_server_spark.functions import register_dialect_shims

    names = register_dialect_shims(spark)
    assert set(names) >= {"strpos", "date_bin", "to_unixtime", "arrow_typeof"}
    return names


class TestShims:
    def test_strpos(self, spark):
        assert spark.sql("SELECT strpos('hello world', 'world') AS p").first().p == 7

    def test_strpos_absent_is_zero(self, spark):
        assert spark.sql("SELECT strpos('abc', 'zz') AS p").first().p == 0

    def test_date_bin_matches_duckdb_time_bucket(self, spark):
        import duckdb

        got = spark.sql(
            "SELECT date_bin(900, TIMESTAMP '2024-01-01 10:34:56', TIMESTAMP '2024-01-01 00:07:00') AS b"
        ).first().b
        want = duckdb.sql(
            "SELECT time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-01-01 10:34:56', TIMESTAMP '2024-01-01 00:07:00')"
        ).fetchone()[0]
        assert got == want

    def test_date_bin_before_origin_floors(self, spark):
        got = spark.sql(
            "SELECT date_bin(900, TIMESTAMP '2024-01-01 00:01:00', TIMESTAMP '2024-01-01 00:07:00') AS b"
        ).first().b
        assert got.isoformat() == "2023-12-31T23:52:00"

    def test_datafusion_spellings_that_are_spark_builtins(self, spark):
        # no shim needed — assert they exist so a Spark upgrade that
        # drops one fails loudly here
        row = spark.sql(
            "SELECT to_char(TIMESTAMP '2024-01-02 03:04:05', 'yyyy-MM-dd') AS c, "
            "regexp_like('abc', 'a.c') AS r, nvl2(NULL, 'a', 'b') AS n, "
            "split_part('a#b', '#', 2) AS sp, levenshtein('abc', 'abd') AS lev"
        ).first()
        assert (row.c, row.r, row.n, row.sp, row.lev) == ("2024-01-02", True, "b", "b", 1)

    def test_array_to_string(self, spark):
        assert spark.sql("SELECT array_to_string(array('a','b'), '-') AS s").first().s == "a-b"

    def test_gcd_lcm_euclid_fold(self, spark):
        import duckdb

        row = spark.sql(
            "SELECT gcd(12L, 18L) AS g, gcd(0L, 7L) AS gz, gcd(0L, 0L) AS g00, "
            "gcd(-12L, 18L) AS gneg, lcm(4L, 6L) AS l, lcm(0L, 5L) AS lz, "
            "lcm(-4L, 6L) AS lneg, gcd(1071L, 462L) AS gbig"
        ).first()
        want = duckdb.sql(
            "SELECT gcd(12, 18), gcd(0, 7), gcd(0, 0), gcd(-12, 18), "
            "lcm(4, 6), lcm(0, 5), lcm(-4, 6), gcd(1071, 462)"
        ).fetchone()
        assert (row.g, row.gz, row.g00, row.gneg, row.l, row.lz, row.lneg, row.gbig) == want

    def test_substr_index_shim(self, spark):
        row = spark.sql(
            "SELECT substr_index('a.b.c', '.', 2) AS two, "
            "substr_index('a.b.c', '.', -1) AS last, "
            "substr_index('abc', '.', 3) AS whole"
        ).first()
        assert (row.two, row.last, row.whole) == ("a.b", "c", "abc")
