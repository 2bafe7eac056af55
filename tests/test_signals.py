"""Late-round-10 signal operators: temporal volume anomalies
(profile.bucket_anomalies) and per-line code-likeness
(text.code_fraction)."""

import datetime

import pyspark.sql.functions as F


def test_bucket_anomalies_flags_the_spike(spark):
    from easydb_server_spark.operators.profile import bucket_anomalies

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(10):
        n = 500 if hour == 7 else 10  # hour 7 is a 50x spike
        for _ in range(n):
            rows.append((eid, base + datetime.timedelta(hours=hour), "click"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, grp string")
    out = {r.window_start: r for r in bucket_anomalies(df, "ts", "grp").collect()}
    assert len(out) == 10
    spike = out["2024-01-01 07:00:00"]
    assert spike.is_anomaly and spike.z > 2.0 and spike.n == 500
    quiet = [r for k, r in out.items() if k != "2024-01-01 07:00:00"]
    assert all(not r.is_anomaly for r in quiet)


def test_bucket_anomalies_constant_traffic_is_calm(spark):
    from easydb_server_spark.operators.profile import bucket_anomalies

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(hours=i % 5), "view") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, grp string")
    out = bucket_anomalies(df, "ts", "grp").collect()
    assert all(r.z == 0.0 and not r.is_anomaly for r in out)


def test_code_fraction_discriminates(spark):
    from easydb_server_spark.operators.text import code_fraction

    code = "def main():\n    x = load();\n    return x\n}"
    prose = "It was a bright cold day in April.\nThe clocks were striking."
    fenced = "see below\n```\nnot counted by lines but flagged\n```"
    df = spark.createDataFrame(
        [(1, code), (2, prose), (3, fenced), (4, None)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in code_fraction(df, "text", "doc_id").collect()}
    assert rows[1].code_frac == 1.0 and rows[1].n_code_lines == 4
    assert rows[2].code_frac == 0.0 and not rows[2].has_fence
    assert rows[3].has_fence
    assert rows[4].n_lines is None and rows[4].code_frac is None


def test_code_fraction_each_heuristic_fires(spark):
    from easydb_server_spark.operators.text import code_fraction

    lines = [
        "        deep indent",
        "statement();",
        "import collections",
        "a => b",
        "just words here",
    ]
    df = spark.createDataFrame([(1, "\n".join(lines))], ["doc_id", "text"])
    (row,) = code_fraction(df, "text", "doc_id").collect()
    assert row.n_code_lines == 4 and row.n_lines == 5
