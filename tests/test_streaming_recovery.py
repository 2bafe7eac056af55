"""Streaming checkpoint semantics: files already processed under a
checkpoint are not re-processed on restart (exactly-once file-source
ingestion) — the property that makes incremental 100 TB landing-zone
pipelines safe to re-run."""

import json


def _write_events(path, ids):
    rows = [
        {"event_id": i, "ts": f"2024-01-01T00:{i % 60:02d}:00", "user_id": i % 3,
         "event_type": "click", "value": 1.0, "props": "{}"}
        for i in ids
    ]
    path.write_text("\n".join(json.dumps(r) for r in rows))


def test_checkpointed_stream_is_exactly_once(spark, tmp_path):
    from easydb_server_spark.streaming import stream_events_ndjson

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            stream_events_ndjson(spark, str(src_dir))
            .select("event_id", "user_id")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_events(src_dir / "batch1.json", range(0, 10))
    run_once()
    first = spark.read.parquet(out_dir)
    assert first.count() == 10

    # restart with one new file: only the delta lands in the sink
    _write_events(src_dir / "batch2.json", range(10, 15))
    run_once()
    final = spark.read.parquet(out_dir)
    assert final.count() == 15
    assert final.select("event_id").distinct().count() == 15  # no dupes
