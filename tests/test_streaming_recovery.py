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


def test_watermark_drops_late_data_across_restarts(spark, tmp_path):
    """Append-mode windowed aggregation: once the watermark (persisted
    in the checkpoint) passes a window's end, a straggler event for
    that window arriving in a later batch is DROPPED — bounded state
    means accepting this documented loss."""
    import json as _json

    from easydb_server_spark.streaming import stream_events_ndjson, windowed_counts

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            windowed_counts(stream_events_ndjson(spark, str(src_dir)))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def rows(items):
        return "\n".join(
            _json.dumps(
                {"event_id": i, "ts": ts, "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"}
            )
            for i, ts in items
        )

    # batch 1: three events in [00:00, 01:00) plus a marker at 06:00
    # that advances the watermark to 04:00 (2h delay) at batch end
    (src_dir / "b1.json").write_text(
        rows([(1, "2024-01-01T00:10:00"), (2, "2024-01-01T00:20:00"),
              (3, "2024-01-01T00:45:00"), (4, "2024-01-01T06:00:00")])
    )
    run_once()
    # batch 2: a straggler for the long-closed 00:00 window + a fresh event
    (src_dir / "b2.json").write_text(
        rows([(5, "2024-01-01T00:50:00"), (6, "2024-01-01T06:30:00")])
    )
    run_once()
    got = {
        (r.window_start.isoformat(), r.n)
        for r in spark.read.parquet(out_dir).collect()
    }
    # the 00:00 window emitted with the 3 on-time events only — the
    # late event_id=5 did not resurrect or re-emit the closed window
    assert ("2024-01-01T00:00:00", 3) in got
    assert ("2024-01-01T00:00:00", 4) not in got
    assert ("2024-01-01T00:00:00", 1) not in got


def test_dedup_state_survives_restart(spark, tmp_path):
    """Checkpointed streaming dropDuplicates (the stream_dedup shape:
    key = user, event_type, 1h event-time window): the dedup state
    store persists in the checkpoint, so a duplicate of an
    already-seen key arriving in a LATER batch — after a restart — is
    still dropped. This is the property that makes re-running an
    ingestion pipeline against a landing zone idempotent."""
    import pyspark.sql.functions as F

    from easydb_server_spark.streaming import stream_events_ndjson

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        dedup = (
            stream_events_ndjson(spark, str(src_dir))
            .withWatermark("ts", "2 hours")
            .withColumn("w", F.window("ts", "1 hour"))
            .dropDuplicates(["user_id", "event_type", "w"])
            .select("user_id", "event_type", F.col("w.start").alias("window_start"))
        )
        q = (
            dedup.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_events(src_dir / "b1.json", [1])  # user 1, minute 00:01
    run_once()
    assert spark.read.parquet(out_dir).count() == 1

    # restart: a same-key duplicate (user 1, same hour window) plus a
    # genuinely new key (user 2) land in a second file
    _write_events(src_dir / "b2.json", [61, 2])  # 61 % 3 == 1, min :01; 2 is new
    run_once()
    final = spark.read.parquet(out_dir)
    assert final.count() == 2  # duplicate dropped ACROSS the restart
    assert {r.user_id for r in final.collect()} == {1, 2}


def test_stream_stream_join_matches_batch_join(spark, tmp_path):
    """Stream-stream interval join (both sides watermarked, time-bound
    both directions → bounded state) produces exactly the batch
    theta-join's pairs on the same data."""
    import json as _json

    import pyspark.sql.functions as F

    from easydb_server_spark.streaming import stream_events_ndjson, stream_stream_join
    from easydb_server_spark.streaming.events import EVENT_SCHEMA

    src_dir = tmp_path / "ev"
    src_dir.mkdir()
    rows = []
    for i in range(40):
        rows.append({"event_id": i, "ts": f"2024-01-01T00:{i:02d}:00", "user_id": i % 4,
                     "event_type": "view", "value": 1.0, "props": "{}"})
    for i in range(40, 60):
        rows.append({"event_id": i, "ts": f"2024-01-01T00:{i - 20:02d}:30", "user_id": i % 4,
                     "event_type": "purchase", "value": 2.0, "props": "{}"})
    (src_dir / "all.json").write_text("\n".join(_json.dumps(r) for r in rows))

    src = stream_events_ndjson(spark, str(src_dir))
    joined = stream_stream_join(
        src.where(F.col("event_type") == "view"),
        src.where(F.col("event_type") == "purchase"),
        max_delay="10 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.v_id, r.p_id) for r in spark.sql("SELECT * FROM ssj").collect()}

    batch = spark.read.schema(EVENT_SCHEMA).json(str(src_dir))
    v = batch.where(F.col("event_type") == "view").selectExpr("user_id u", "ts vts", "event_id vid")
    p = batch.where(F.col("event_type") == "purchase").selectExpr("user_id pu", "ts pts", "event_id pid")
    want = {
        (r.vid, r.pid)
        for r in v.join(
            p, F.expr("u = pu AND pts >= vts AND pts <= vts + INTERVAL 10 minutes")
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_funnel_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState funnel: the per-user state store lives in
    the checkpoint, so a kill/restart between micro-batches must
    preserve every funnel state variant — a HALF-OPEN funnel (signup +
    click before the restart) completes on a purchase after it; a
    COMPLETED funnel's early reset persists (click + purchase after
    the restart do NOT re-complete without a fresh signup); and the
    timeout still applies to pre-restart signups (late purchase is
    silently dropped). This is the only stateful operator whose
    recovery was previously untested."""
    import json as _json

    from easydb_server_spark.operators.stateful import funnel_detection_stream
    from easydb_server_spark.streaming import stream_events_ndjson

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ev(i, user, etype, ts):
        return _json.dumps(
            {"event_id": i, "ts": ts, "user_id": user, "event_type": etype,
             "value": 1.0, "props": "{}"}
        )

    def run_once():
        q = (
            funnel_detection_stream(stream_events_ndjson(spark, str(src_dir)), timeout_s=3600.0)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: user 1 half-open (signup+click); user 2 completes and
    # resets; user 3 half-open but will expire before its purchase
    (src_dir / "b1.json").write_text(
        "\n".join(
            [
                ev(1, 1, "signup", "2024-01-01T00:01:00"),
                ev(2, 1, "click", "2024-01-01T00:02:00"),
                ev(3, 2, "signup", "2024-01-01T00:01:00"),
                ev(4, 2, "click", "2024-01-01T00:02:00"),
                ev(5, 2, "purchase", "2024-01-01T00:03:00"),
                ev(6, 3, "signup", "2024-01-01T00:01:00"),
                ev(7, 3, "click", "2024-01-01T00:02:00"),
            ]
        )
    )
    run_once()
    first = {(r.user_id, r.purchase_ts.isoformat()) for r in spark.read.parquet(out_dir).collect()}
    assert first == {(2, "2024-01-01T00:03:00")}

    # RESTART from the checkpoint. user 1's purchase completes the
    # pre-restart funnel; user 2's click+purchase find reset state (no
    # second completion); user 3's purchase is past the 1h timeout
    (src_dir / "b2.json").write_text(
        "\n".join(
            [
                ev(8, 1, "purchase", "2024-01-01T00:10:00"),
                ev(9, 2, "click", "2024-01-01T00:10:00"),
                ev(10, 2, "purchase", "2024-01-01T00:11:00"),
                ev(11, 3, "purchase", "2024-01-01T02:30:00"),
            ]
        )
    )
    run_once()
    final = {
        (r.user_id, r.signup_ts.isoformat(), r.purchase_ts.isoformat())
        for r in spark.read.parquet(out_dir).collect()
    }
    assert final == {
        (2, "2024-01-01T00:01:00", "2024-01-01T00:03:00"),
        (1, "2024-01-01T00:01:00", "2024-01-01T00:10:00"),
    }


def test_append_window_emits_when_end_equals_watermark_exactly(spark, tmp_path):
    """Boundary lock for the append-mode oracles' comparator: with
    watermark = max(ts) − delay, a window whose end lands EXACTLY on
    the watermark is EMITTED (Spark flushes window_end <= watermark,
    not <). The sf fixtures never hit this boundary, so the streamq
    oracles' ``<=`` was empirically untested until now; if a Spark
    upgrade flipped the comparator this is the test that fails, and
    the oracles must flip with it."""
    import json as _json

    import pyspark.sql.functions as F

    from easydb_server_spark.streaming import stream_events_ndjson

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    # 1h tumbling windows, 2h delay. Events in [00:00, 01:00) and
    # [01:00, 02:00); max ts = 03:00:00.000 exactly → watermark =
    # 01:00:00.000 == end of the first window (ms truncation is a
    # no-op on a whole second, isolating the comparator).
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:10:00", "user_id": 1,
         "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:40:00", "user_id": 2,
         "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01T01:20:00", "user_id": 1,
         "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 4, "ts": "2024-01-01T03:00:00", "user_id": 1,
         "event_type": "click", "value": 1.0, "props": "{}"},
    ]
    (src_dir / "b.json").write_text("\n".join(_json.dumps(r) for r in rows))
    agg = (
        stream_events_ndjson(spark, str(src_dir))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_boundary")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.window_start, r.n) for r in spark.sql("SELECT * FROM wm_boundary").collect()}
    # the window ending exactly ON the watermark emitted; the one
    # ending one hour past it (and the open 03:00 window) did not
    assert got == {("2024-01-01 00:00:00", 2)}


def test_append_windows_emit_exactly_the_watermark_closed_set(spark):
    """The three windowed conformance streams run in APPEND mode: the
    final no-data micro-batch must emit exactly the windows whose end
    the watermark (max event time − delay) has passed — trailing open
    windows are withheld and their state evicted, which is the bounded-
    state contract complete mode could not provide."""
    import pyspark.sql.functions as F

    from easydb_server_spark.queries._util import load
    from easydb_server_spark.queries.streamq import q_stream_tumbling
    from tests.conftest import SF_DIR

    emitted = {
        (r.window_start, r.event_type)
        for r in q_stream_tumbling(spark, SF_DIR).collect()
    }
    e = load(spark, SF_DIR, "events")
    wm = e.agg(
        (F.date_trunc("millisecond", F.max("ts")) - F.expr("INTERVAL 2 HOURS")).alias("w")
    ).collect()[0].w
    batch = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
        .select(
            F.col("w.start").cast("string").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
        )
    )
    closed = {(r.ws, r.event_type) for r in batch.where(F.col("we") <= F.lit(wm)).collect()}
    open_ = {(r.ws, r.event_type) for r in batch.where(F.col("we") > F.lit(wm)).collect()}
    assert emitted == closed
    assert open_ and not (emitted & open_)  # trailing windows really were withheld


def test_session_emission_boundary_at_exact_watermark(spark, tmp_path):
    """Pin BOTH session boundaries the oracles encode, at exact
    equality (the regeneration differential caught the batch gap
    boundary; this locks the streaming WATERMARK boundary):

    * a session whose end (last event + 5 min gap) equals the final
      watermark EXACTLY is emitted — Spark's flush predicate is
      ``end <= watermark``, the oracle's ``MAX(ts)+gap <= w``;
    * end strictly before the watermark: emitted;
    * end strictly after: withheld (still-open state).
    """
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from easydb_server_spark.queries.streamq import q_stream_session

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    T = base + datetime.timedelta(minutes=60)
    rows = [
        # user 1: end = T-30min == watermark (= max_ts - 30min) exactly
        (0, T - datetime.timedelta(minutes=35), 1, "view", 1.0, "{}"),
        # user 2: end = T-31min < watermark
        (1, T - datetime.timedelta(minutes=36), 2, "view", 1.0, "{}"),
        # user 3: end = T-24min > watermark -> withheld
        (2, T - datetime.timedelta(minutes=29), 3, "view", 1.0, "{}"),
        # the watermark driver
        (3, T, 9, "view", 1.0, "{}"),
    ]
    sf = str(tmp_path / "wm_edge")
    os.makedirs(sf, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        f"{sf}/events.parquet",
    )
    out = q_stream_session(spark, sf).collect()
    emitted = {r.user_id for r in out}
    assert 1 in emitted, "end == watermark must be emitted (flush is end <= wm)"
    assert 2 in emitted
    assert 3 not in emitted and 9 not in emitted
