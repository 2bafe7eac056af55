"""Cross-engine exactness of :mod:`functions.exactround`.

The r10/r11 `emb_covariance` post-mortem: Spark `round(double, k)`
rounds the shortest decimal representation HALF_UP (BigDecimal),
DuckDB rounds the binary double — at exact k-decimal midpoints the two
engines disagree BY DESIGN. These tests pin the repo-wide replacement:
`round_div_sql` must produce bit-identical doubles on Spark, DuckDB,
and an exact `fractions.Fraction` ground truth, INCLUDING adversarial
midpoint inputs (the class that flipped the driver row two rounds in a
row: qsum=2556150, D=10*(n-1) -> cov=0.2556150 exactly).
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest

from easydb_server_spark.functions.exactround import round_div, round_div_sql


def _expected(num: int, den: int, k: int) -> float:
    """Exact HALF_UP (half-away-from-zero) rounding via Fraction."""
    v = Fraction(abs(num) * 10**k, den)
    q = v.numerator // v.denominator
    rem = v - q
    if 2 * rem >= 1:
        q += 1
    if num < 0:
        q = -q
    return q / float(10**k)


# (num, den, k): midpoints, near-midpoints, negatives, zero, large.
CASES = [
    # the exact r11 driver-failure shape: qsum=2556150, n=1280 -> D=10*1279
    (2556150, 12790 * 1000000 // 10, 5),
    # generic decimal midpoints at several k
    (5, 10, 0),
    (15, 10, 0),
    (25, 10, 0),
    (-5, 10, 0),
    (-15, 10, 0),
    (125, 100, 1),
    (-125, 100, 1),
    (1255, 1000, 2),
    (12345675, 10000000, 6),
    # count-denominator rationals (averages): den=7 etc.
    (22, 7, 2),
    (1000000000000000, 7, 2),
    (-1000000000000001, 7, 4),
    # exact integers and zeros
    (0, 3, 4),
    (9, 3, 5),
    (-9, 3, 5),
    # large numerators near the headroom contract
    (9_000_000_000_000_000_000, 3_000_000_000_000, 2),
    (4_611_686_018_427_387_903, 9999991, 0),
]


@pytest.mark.parametrize("num,den,k", CASES)
def test_matches_fraction_ground_truth(spark, num, den, k):
    got = spark.sql(
        f"SELECT {round_div_sql(str(num), str(den), k, 'spark')} AS v"
    ).collect()[0].v
    assert got == _expected(num, den, k), (num, den, k)


@pytest.mark.parametrize("num,den,k", CASES)
def test_duckdb_matches_fraction_ground_truth(num, den, k):
    got = duckdb.sql(
        f"SELECT {round_div_sql(f'CAST({num} AS BIGINT)', f'CAST({den} AS BIGINT)', k, 'duckdb')} AS v"
    ).fetchone()[0]
    assert got == _expected(num, den, k), (num, den, k)


def test_spark_duckdb_agree_on_midpoint_sweep(spark):
    """Dense sweep across every residue class of a small denominator —
    hits every midpoint — plus the documented Spark-vs-DuckDB
    divergence check: the old ROUND(double) form MUST disagree
    somewhere in this sweep (proving the sweep has teeth), the new
    integer form must agree everywhere.
    """
    k = 5
    n = 11
    den = (n - 1) * 10**6  # emb_covariance denominator, midpoint-rich:
    # num/1e7 has an exact 6th decimal digit, so num ≡ 50 (mod 100)
    # lands EXACTLY on a 5-decimal midpoint (0.2556150 -> .25561|5).
    nums = list(range(2556050, 2557050, 50)) + list(range(2556140, 2556160))
    expr_s = round_div_sql("num", "den", k, "spark")
    expr_d = round_div_sql("num", "den", k, "duckdb")
    sdf = spark.createDataFrame(
        [(x, den) for x in nums], "num bigint, den bigint"
    )
    got_s = {r.num: r.v for r in sdf.selectExpr("num", f"{expr_s} AS v").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(x, den) for x in nums])
    got_d = {num: v for num, v in con.execute(f"SELECT num, {expr_d} FROM t").fetchall()}
    for x in nums:
        exp = _expected(x, den, k)
        assert got_s[x] == exp, f"spark num={x}"
        assert got_d[x] == exp, f"duckdb num={x}"

    # teeth: the OLD double-rounding forms disagree on this sweep
    old_s = {
        r.num: r.v
        for r in sdf.selectExpr(
            "num", f"round(CAST(num AS DOUBLE) / den, {k}) AS v"
        ).collect()
    }
    old_d = {
        num: v
        for num, v in con.execute(
            f"SELECT num, round(CAST(num AS DOUBLE) / den, {k}) FROM t"
        ).fetchall()
    }
    assert any(old_s[x] != old_d[x] for x in nums), (
        "sweep no longer covers a Spark-vs-DuckDB ROUND(double) midpoint "
        "divergence — rebuild the adversarial cases"
    )


def test_round_div_column_form(spark):
    df = spark.createDataFrame([(2556150, 12790)], "qsum bigint, d bigint")
    row = df.select(round_div("qsum", "d * 1000", 5).alias("v")).collect()[0]
    # 2556150 / 12790000 = 0.19985535... -> 0.19986 (not a midpoint)
    assert row.v == _expected(2556150, 12790000, 5)


def test_rejects_negative_k():
    with pytest.raises(ValueError):
        round_div_sql("a", "b", -1, "spark")


@pytest.mark.parametrize(
    "num,den,k",
    [c for c in CASES if abs(c[0]) * 10 ** c[2] < 2**50],
)
def test_round_ratio_column_matches_fraction(spark, num, den, k):
    from pyspark.sql import functions as F

    from easydb_server_spark.functions.exactround import round_ratio

    df = spark.createDataFrame([(num, den)], "a bigint, b bigint")
    got = df.select(round_ratio(F.col("a"), F.col("b"), k).alias("v")).collect()[0].v
    assert got == _expected(num, den, k), (num, den, k)


def test_round_ratio_midpoint_denominators(spark):
    """The per-row danger class: reduced denominator exactly 2^7*5^j
    puts n/d on a k-decimal midpoint for every odd numerator."""
    from pyspark.sql import functions as F

    from easydb_server_spark.functions.exactround import round_ratio

    rows = [(n, d) for d in (128, 640, 3200, 256, 384) for n in range(1, 12)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = df.select("a", "b", round_ratio(F.col("a"), F.col("b"), 6).alias("v")).collect()
    for r in got:
        assert r.v == _expected(r.a, r.b, 6), (r.a, r.b)


def test_ratio_ge_matches_rounded_gate(spark):
    """ratio_ge must select exactly the rows whose round_ratio output
    passes the >= gate — including exact-midpoint rows."""
    from pyspark.sql import functions as F

    from easydb_server_spark.functions.exactround import ratio_ge, round_ratio

    rows = [(n, d) for d in (128, 640, 3200, 7, 400, 1) for n in range(0, 30)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    out = df.select(
        "a",
        "b",
        round_ratio(F.col("a"), F.col("b"), 6).alias("v"),
        ratio_ge(F.col("a"), F.col("b"), 6, 0.039063).alias("p"),
    ).collect()
    for r in out:
        assert r.p == (r.v >= 0.039063), (r.a, r.b, r.v, r.p)


def test_ratio_ge_rejects_off_grid_threshold():
    from pyspark.sql import functions as F

    from easydb_server_spark.functions.exactround import ratio_ge

    with pytest.raises(ValueError, match="grid"):
        ratio_ge(F.lit(1), F.lit(2), 2, 0.12345)
