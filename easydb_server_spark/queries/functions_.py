"""Scalar function families (SURVEY.md §2.B "Scalar function families").

One conformance query per family, each exercising the representative
DataFusion built-ins through their Spark equivalents (all JVM-side —
whole-stage codegen, no Python in the hot path). Name aliasing for the
engine's SQL gateway (strpos→instr, to_char→date_format, …) lives in
:mod:`easydb_server_spark.functions.shims`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.queries._util import load


def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/ceil/floor/round/power/sqrt/exp/ln/log/trig/sign."""
    p = load(spark, sf_dir, "part")
    x = F.col("p_retailprice") - 950.0
    return (
        p.where(F.col("p_partkey") <= 300)
        .select(
            "p_partkey",
            F.abs(x).alias("abs_x"),
            F.ceil(x).alias("ceil_x"),
            F.floor(x).alias("floor_x"),
            F.round(F.pow(F.col("p_size"), 2), 1).alias("size_sq"),
            F.round(F.sqrt(F.col("p_retailprice")), 6).alias("sqrt_price"),
            F.round(F.log(F.col("p_retailprice")), 6).alias("ln_price"),
            F.round(F.log10(F.col("p_retailprice")), 6).alias("log10_price"),
            F.round(F.sin(F.col("p_size")), 6).alias("sin_size"),
            F.round(F.atan2(F.col("p_size"), F.lit(10.0)), 6).alias("atan2_v"),
            F.signum(x).cast("int").alias("sign_x"),
            F.round(F.degrees(F.lit(1.0)), 6).alias("deg1"),
            F.factorial(F.col("p_size") % 6).alias("fact_mod"),
        )
        .orderBy("p_partkey")
    )


ORACLE_FN_MATH = """
SELECT p_partkey,
       ABS(p_retailprice - 950.0)                    AS abs_x,
       CAST(CEIL(p_retailprice - 950.0) AS BIGINT)   AS ceil_x,
       CAST(FLOOR(p_retailprice - 950.0) AS BIGINT)  AS floor_x,
       ROUND(POWER(p_size, 2), 1)                    AS size_sq,
       ROUND(SQRT(p_retailprice), 6)                 AS sqrt_price,
       ROUND(LN(p_retailprice), 6)                   AS ln_price,
       ROUND(LOG10(p_retailprice), 6)                AS log10_price,
       ROUND(SIN(p_size), 6)                         AS sin_size,
       ROUND(ATAN2(p_size, 10.0), 6)                 AS atan2_v,
       CAST(SIGN(p_retailprice - 950.0) AS INT)      AS sign_x,
       ROUND(DEGREES(1.0), 6)                        AS deg1,
       CAST(FACTORIAL(CAST(p_size % 6 AS INT)) AS BIGINT) AS fact_mod
FROM part WHERE p_partkey <= 300
ORDER BY p_partkey
"""


def q_fn_math_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperbolic/advanced math + length/char primitives: sinh/cosh/
    tanh (DuckDB oracle emulates via exp — DuckDB 1.0 lacks them),
    cbrt, exp, trunc, pi, chr, octet_length, bit_length, isnan/nanvl."""
    p = load(spark, sf_dir, "part")
    x = (F.col("p_size") % 5).cast("double") / 2.0
    return (
        p.where(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.round(F.sinh(x), 6).alias("sinh_x"),
            F.round(F.cosh(x), 6).alias("cosh_x"),
            F.round(F.tanh(x), 6).alias("tanh_x"),
            F.round(F.cbrt(F.col("p_retailprice")), 6).alias("cbrt_price"),
            F.round(F.exp(x), 6).alias("exp_x"),
            # Spark's trunc() is date-only; numeric truncation toward
            # zero is the bigint cast (positive domain here)
            F.col("p_retailprice").cast("bigint").alias("trunc_price"),
            F.round(F.lit(3.14159265).cast("double") * 0 + F.expr("pi()"), 8).alias("pi_val"),
            F.expr("char(p_size % 26 + 65)").alias("letter"),
            F.expr("octet_length(p_name)").alias("byte_len"),
            F.expr("bit_length(p_name)").alias("bit_len"),
            # note: isnan(NULL) diverges across engines (Spark false,
            # DuckDB NULL) — test genuine NaN / non-NaN instead
            F.expr("isnan(cast('nan' as double))").alias("isnan_true"),
            F.expr("isnan(p_retailprice)").alias("isnan_false"),
            F.round(F.expr("nanvl(cast('nan' as double), p_retailprice)"), 2).alias("nan_defaulted"),
        )
        .orderBy("p_partkey")
    )


ORACLE_FN_MATH_EXTENDED = """
SELECT p_partkey,
       ROUND((exp(x) - exp(-x)) / 2, 6)  AS sinh_x,
       ROUND((exp(x) + exp(-x)) / 2, 6)  AS cosh_x,
       ROUND((exp(x) - exp(-x)) / (exp(x) + exp(-x)), 6) AS tanh_x,
       ROUND(cbrt(p_retailprice), 6)     AS cbrt_price,
       ROUND(exp(x), 6)                  AS exp_x,
       CAST(trunc(p_retailprice) AS BIGINT) AS trunc_price,
       ROUND(pi(), 8)                    AS pi_val,
       chr(CAST(p_size % 26 + 65 AS INT)) AS letter,
       CAST(strlen(p_name) AS INT)       AS byte_len,
       CAST(bit_length(p_name) AS INT)   AS bit_len,
       isnan(CAST('nan' AS DOUBLE))      AS isnan_true,
       isnan(p_retailprice)              AS isnan_false,
       ROUND(p_retailprice, 2)           AS nan_defaulted
FROM (SELECT *, CAST(p_size % 5 AS DOUBLE) / 2.0 AS x FROM part)
WHERE p_partkey <= 200
ORDER BY p_partkey
"""


def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, pad, trim, substring, translate, split_part,
    position, repeat, reverse, left/right, length variants."""
    c = load(spark, sf_dir, "customer")
    s = F.col("c_name")
    return (
        c.where(F.col("c_custkey") <= 300)
        .select(
            "c_custkey",
            F.upper(s).alias("up"),
            F.lower(s).alias("lo"),
            F.length(s).alias("len"),
            F.substring(s, 2, 5).alias("sub"),
            F.lpad(s, 15, "*").alias("lpadded"),
            F.rpad(F.col("c_mktsegment"), 12, ".").alias("rpadded"),
            F.trim(F.lit("  x  ")).alias("trimmed"),
            F.reverse(s).alias("rev"),
            F.repeat(F.lit("ab"), 3).alias("rep"),
            F.instr(s, "er").alias("pos_er"),
            F.translate(s, "#0", "_O").alias("trans"),
            F.substring_index(s, "#", -1).alias("after_hash"),
            F.concat_ws("|", s, F.col("c_mktsegment")).alias("joined"),
            F.expr("left(c_name, 8)").alias("l8"),
            F.expr("right(c_name, 4)").alias("r4"),
            F.ascii(s).alias("first_code"),
            (F.length(s) * 8).alias("bit_len"),
        )
        .orderBy("c_custkey")
    )


ORACLE_FN_STRING = """
SELECT c_custkey,
       UPPER(c_name)                    AS up,
       LOWER(c_name)                    AS lo,
       CAST(LENGTH(c_name) AS INT)      AS len,
       SUBSTRING(c_name, 2, 5)          AS sub,
       LPAD(c_name, 15, '*')            AS lpadded,
       RPAD(c_mktsegment, 12, '.')      AS rpadded,
       TRIM('  x  ')                    AS trimmed,
       REVERSE(c_name)                  AS rev,
       REPEAT('ab', 3)                  AS rep,
       CAST(INSTR(c_name, 'er') AS INT) AS pos_er,
       TRANSLATE(c_name, '#0', '_O')    AS trans,
       CASE WHEN INSTR(c_name, '#') > 0 THEN split_part(c_name, '#', 2) ELSE c_name END AS after_hash,
       CONCAT_WS('|', c_name, c_mktsegment) AS joined,
       LEFT(c_name, 8)                  AS l8,
       RIGHT(c_name, 4)                 AS r4,
       CAST(ASCII(c_name) AS INT)       AS first_code,
       CAST(LENGTH(c_name) * 8 AS INT)  AS bit_len
FROM customer WHERE c_custkey <= 300
ORDER BY c_custkey
"""


def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: rlike, regexp_extract, regexp_replace + JSON-ish
    extraction from the events props column."""
    e = load(spark, sf_dir, "events")
    return (
        e.where(F.col("event_id") <= 2000)
        .select(
            "event_id",
            F.col("event_type").rlike("^(click|view)$").alias("is_passive"),
            F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1).cast("int").alias("k_val"),
            F.regexp_replace(F.col("event_type"), "[aeiou]", "_").alias("devoweled"),
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("k_json"),
        )
        .orderBy("event_id")
    )


ORACLE_FN_REGEX = """
SELECT event_id,
       regexp_matches(event_type, '^(click|view)$')                    AS is_passive,
       CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)          AS k_val,
       regexp_replace(event_type, '[aeiou]', '_', 'g')                 AS devoweled,
       CAST(json_extract_string(props, '$.k') AS INT)                  AS k_json
FROM events WHERE event_id <= 2000
ORDER BY event_id
"""


def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: trunc, extract, format, epoch, make_date,
    interval arithmetic, datediff, last_day."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.where(F.col("o_orderkey") <= 1500)
        .select(
            "o_orderkey",
            F.date_trunc("month", d).cast("date").cast("string").alias("month_start"),
            F.year(d).alias("yr"),
            F.month(d).alias("mo"),
            F.dayofmonth(d).alias("dom"),
            F.quarter(d).alias("qtr"),
            F.dayofyear(d).alias("doy"),
            (F.dayofweek(d) - 1).alias("dow_sunday0"),
            F.weekofyear(d).alias("iso_week"),
            F.date_format(d, "yyyy-MM-dd HH:mm").alias("formatted"),
            F.unix_timestamp(d).alias("epoch_s"),
            (d + F.expr("INTERVAL 3 DAYS")).cast("string").alias("plus3d"),
            F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias("days_to_2002"),
            F.last_day(d).cast("string").alias("month_end"),
            F.make_date(F.year(d), F.month(d), F.lit(1)).cast("string").alias("made"),
        )
        .orderBy("o_orderkey")
    )


ORACLE_FN_DATETIME = """
SELECT o_orderkey,
       CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
       CAST(year(o_orderdate) AS INT)        AS yr,
       CAST(month(o_orderdate) AS INT)       AS mo,
       CAST(dayofmonth(o_orderdate) AS INT)  AS dom,
       CAST(quarter(o_orderdate) AS INT)     AS qtr,
       CAST(dayofyear(o_orderdate) AS INT)   AS doy,
       CAST(dayofweek(o_orderdate) AS INT)   AS dow_sunday0,
       CAST(weekofyear(o_orderdate) AS INT)  AS iso_week,
       strftime(o_orderdate, '%Y-%m-%d %H:%M')                        AS formatted,
       CAST(epoch(o_orderdate) AS BIGINT)    AS epoch_s,
       CAST(o_orderdate + INTERVAL 3 DAY AS VARCHAR)                  AS plus3d,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)           AS month_end,
       CAST(make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS VARCHAR) AS made
FROM orders WHERE o_orderkey <= 1500
ORDER BY o_orderkey
"""


def q_fn_datetime_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion family: to_timestamp/to_date parsing, epoch-millis
    round-trip, from_unixtime formatting, date_add/date_sub (session
    timezone pinned UTC by the loader, so epoch math is stable)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    datestr = F.date_format(d, "yyyy-MM-dd HH:mm:ss")
    return (
        o.where(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.to_timestamp(datestr, "yyyy-MM-dd HH:mm:ss").cast("string").alias("parsed_ts"),
            F.to_date(F.date_format(d, "yyyy-MM-dd"), "yyyy-MM-dd").cast("string").alias("parsed_date"),
            F.timestamp_millis(F.unix_millis(F.to_timestamp(datestr))).cast("string").alias("epoch_ms_roundtrip"),
            F.from_unixtime(F.unix_timestamp(F.to_timestamp(datestr)), "yyyy/MM/dd").alias("formatted"),
            F.date_add(d.cast("date"), 30).cast("string").alias("plus30"),
            F.date_sub(d.cast("date"), 7).cast("string").alias("minus7"),
        )
        .orderBy("o_orderkey")
    )


ORACLE_FN_DATETIME_CONVERT = """
SELECT o_orderkey,
       CAST(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS VARCHAR) AS parsed_ts,
       CAST(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS VARCHAR)                          AS parsed_date,
       CAST(epoch_ms(CAST(epoch_ms(o_orderdate) AS BIGINT)) AS VARCHAR)                          AS epoch_ms_roundtrip,
       strftime(o_orderdate, '%Y/%m/%d')                                                         AS formatted,
       CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR)                                           AS plus30,
       CAST(CAST(o_orderdate AS DATE) - 7 AS VARCHAR)                                            AS minus7
FROM orders WHERE o_orderkey <= 1000
ORDER BY o_orderkey
"""


def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/crypto family: md5, sha2-256, hex encode/decode, base64."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5(F.col("n_name")).alias("md5_name"),
        F.sha2(F.col("n_name"), 256).alias("sha256_name"),
        F.hex(F.col("n_nationkey")).alias("hex_key"),
        F.base64(F.col("n_name").cast("binary")).alias("b64_name"),
        F.decode(F.unbase64(F.base64(F.col("n_name").cast("binary"))), "UTF-8").alias("roundtrip"),
    ).orderBy("n_nationkey")


ORACLE_FN_HASH = """
SELECT n_nationkey,
       md5(n_name)                        AS md5_name,
       sha256(n_name)                     AS sha256_name,
       to_hex(n_nationkey)                AS hex_key,
       base64(CAST(n_name AS BLOB))       AS b64_name,
       n_name                             AS roundtrip
FROM nation ORDER BY n_nationkey
"""


def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: construct, sequence, contains, position, distinct,
    sort, slice, element_at, flatten, array_to_string — emitted as
    scalars/strings for stable comparison."""
    n = load(spark, sf_dir, "nation")
    arr = F.sequence(F.lit(1), F.col("n_nationkey") % 5 + 3)
    words = F.split(F.col("n_name"), " ")
    return n.select(
        "n_nationkey",
        F.array_join(arr, ",").alias("seq_csv"),
        F.size(arr).alias("seq_len"),
        F.array_contains(arr, 3).alias("has3"),
        F.array_position(arr, 2).cast("int").alias("pos2"),
        F.element_at(arr, 2).alias("second"),
        F.array_join(F.slice(arr, 2, 2), ",").alias("slice_csv"),
        F.array_join(F.array_sort(F.array_distinct(F.concat(arr, arr))), ",").alias("dedup_csv"),
        F.array_join(F.flatten(F.array(arr, F.array(F.lit(99)))), ",").alias("flat_csv"),
        F.array_join(F.array_sort(words), " ").alias("words_sorted"),
        F.array_max(arr).alias("amax"),
        F.array_min(arr).alias("amin"),
    ).orderBy("n_nationkey")


ORACLE_FN_ARRAY = """
WITH t AS (
  SELECT n_nationkey, n_name,
         generate_series(1, CAST(n_nationkey % 5 + 3 AS BIGINT)) AS arr,
         string_split(n_name, ' ') AS words
  FROM nation
)
SELECT n_nationkey,
       array_to_string(arr, ',')                                 AS seq_csv,
       CAST(len(arr) AS INT)                                     AS seq_len,
       list_contains(arr, 3)                                     AS has3,
       CAST(COALESCE(list_position(arr, 2), 0) AS INT)           AS pos2,
       arr[2]                                                    AS second,
       array_to_string(arr[2:3], ',')                            AS slice_csv,
       array_to_string(list_sort(list_distinct(arr || arr)), ',') AS dedup_csv,
       array_to_string(flatten([arr, [CAST(99 AS BIGINT)]]), ',') AS flat_csv,
       array_to_string(list_sort(words), ' ')                    AS words_sorted,
       list_max(arr)                                             AS amax,
       list_min(arr)                                             AS amin
FROM t ORDER BY n_nationkey
"""


def q_fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/Map family: build nested values, extract fields back out
    (emitted as flat scalars for comparison)."""
    r = load(spark, sf_dir, "region")
    st = F.struct(F.col("r_regionkey").alias("k"), F.col("r_name").alias("v"))
    mp = F.create_map(F.lit("name"), F.col("r_name"), F.lit("code"), F.col("r_regionkey").cast("string"))
    return r.select(
        "r_regionkey",
        st.getField("v").alias("struct_val"),
        F.element_at(mp, "name").alias("map_name"),
        F.element_at(mp, "code").cast("int").alias("map_code"),
        F.array_join(F.array_sort(F.map_keys(mp)), ",").alias("keys_csv"),
    ).orderBy("r_regionkey")


ORACLE_FN_STRUCT_MAP = """
WITH t AS (
  SELECT r_regionkey, r_name,
         {'k': r_regionkey, 'v': r_name} AS st,
         MAP(['name','code'], [r_name, CAST(r_regionkey AS VARCHAR)]) AS mp
  FROM region
)
SELECT r_regionkey,
       st.v                                   AS struct_val,
       mp['name'][1]                          AS map_name,
       CAST(mp['code'][1] AS INT)             AS map_code,
       array_to_string(list_sort(map_keys(mp)), ',') AS keys_csv
FROM t ORDER BY r_regionkey
"""
