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


def test_streaming_anomalies_match_batch(spark, tmp_path):
    """Batch/stream equivalence: anomalies computed from streamed
    per-batch count partitions equal bucket_anomalies over the full
    corpus — even when a bucket's events SPAN two micro-batches."""
    import json

    from easydb_server_spark.streaming import stream_events_ndjson
    from easydb_server_spark.streaming.ingest import (
        read_bucket_anomalies,
        stream_bucket_counts,
    )
    from easydb_server_spark.operators.profile import bucket_anomalies

    def write(path, ids, hours):
        rows = [
            {"event_id": i, "ts": f"2024-01-01T{h:02d}:{i % 60:02d}:00",
             "user_id": i, "event_type": "click", "value": 1.0, "props": "{}"}
            for i in ids for h in hours
        ]
        path.write_text("\n".join(json.dumps(r) for r in rows))

    src = tmp_path / "in"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    # batch 1: hours 0-8 sparse; batch 2 adds hour 9 AND re-touches
    # hour 4 with a burst (the bucket spans both batches). A single
    # spike's z is bounded by sqrt(k-1), so 10 buckets are needed for
    # the 2.0 threshold to fire (z ~= 2.85 here).
    write(src / "b1.json", range(10), range(9))
    q = stream_bucket_counts(stream_events_ndjson(spark, str(src)), "ts", "event_type", store, ckpt)
    q.awaitTermination()
    write(src / "b2.json", range(10, 110), [4])
    write(src / "b2b.json", range(10, 20), [9])
    q = stream_bucket_counts(stream_events_ndjson(spark, str(src)), "ts", "event_type", store, ckpt)
    q.awaitTermination()

    streamed = sorted(tuple(r) for r in read_bucket_anomalies(spark, store).collect())

    batch_df = spark.read.json(str(src)).selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "event_type"
    )
    batch = sorted(tuple(r) for r in bucket_anomalies(batch_df, "ts", "event_type").collect())
    assert streamed == batch
    assert any(r[4] for r in streamed)  # the burst IS flagged
