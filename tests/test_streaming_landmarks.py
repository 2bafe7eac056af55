"""Continuous near-dup audio ingest (streaming/ingest.py:
stream_landmark_ingest): cross-batch landmark dedup whose only state
is the persistent bucketed landmark index — stream/batch equivalence,
replay idempotence of the vote-bearing index, and restart recovery."""

import uuid

import numpy as np
import pyspark.sql.functions as F


def _clip(base, off=0, nseg=4, amp=9000.0):
    """Frame-aligned bin-exact tone WAV (the audio-landmark fixture
    recipe): ``off`` leading silence frames, ``nseg`` tone frames."""
    from easydb_server_spark.operators.wav import encode_wav

    j = np.arange(64, dtype=np.float64)
    segs = [np.zeros(64 * off, dtype=np.float64)] if off else []
    for k in range(nseg):
        b = 1 + (base * 7 + k * 11 + base * k * 5) % 31
        segs.append(np.round(amp * np.sin(2.0 * np.pi * b * j / 64.0)))
    return encode_wav(np.concatenate(segs).astype(np.int16), 8000)


def _write_batch(spark, path, rows, order=0):
    """One parquet FILE per micro-batch (the FileStreamSource does not
    recurse into directories); spaced mtimes make the batch sequence
    deterministic (FileStreamSource batches in mtime order)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path.parent.mkdir(parents=True, exist_ok=True)
    t = pa.table(
        {
            "item_id": pa.array([r[0] for r in rows], pa.int64()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )
    pq.write_table(t, str(path))
    mt = 1_700_000_000 + order * 60
    os.utime(path, (mt, mt))


def _run(spark, in_dir, table, decisions, ckpt):
    from easydb_server_spark.streaming.ingest import (
        AUDIO_BLOB_SCHEMA,
        stream_landmark_ingest,
    )

    src = (
        spark.readStream.schema(AUDIO_BLOB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = stream_landmark_ingest(
        src, "payload", "item_id", table, str(decisions), str(ckpt)
    )
    q.awaitTermination()


def test_stream_landmark_ingest_cross_batch_and_equivalence(spark, tmp_path):
    """Batch 0: two originals + one in-batch gain copy. Batch 1: a
    padded copy of an admitted clip (cross-batch corpus reject), a
    trimmed copy (also rejected — the shift-robust case), and one
    novel clip. Admissions match the batch operator run over the same
    partitioning of history."""
    table = f"lm_ingest_{uuid.uuid4().hex[:8]}"
    in_dir, decisions, ckpt = tmp_path / "in", tmp_path / "dec", tmp_path / "ckpt"
    _write_batch(
        spark, in_dir / "b0.parquet",
        [(1, _clip(0)), (2, _clip(5)), (3, _clip(0, amp=4000.0))], order=0,
    )
    _write_batch(
        spark, in_dir / "b1.parquet",
        [(10, _clip(0, off=2)), (11, _clip(5, nseg=3)), (12, _clip(9))], order=1,
    )
    try:
        _run(spark, in_dir, table, decisions, ckpt)
        out = {r["item_id"]: (r["corpus_match"], r["batch_match"], r["admitted"])
               for r in spark.read.parquet(str(decisions)).collect()}
        # batch 0: empty corpus; 3 batch-matches 1 (same landmarks)
        assert out[1] == (None, None, True)
        assert out[2] == (None, None, True)
        assert out[3] == (None, 1, False)
        # batch 1: padded + trimmed copies both corpus-matched to the
        # canonical admitted clip; the novel clip admitted
        assert out[10] == (1, None, False)
        assert out[11] == (2, None, False)
        assert out[12] == (None, None, True)
        # index holds landmarks for exactly the admitted clips
        idx_items = {
            r["item_id"]
            for r in spark.table(table).select("item_id").distinct().collect()
        }
        assert idx_items == {1, 2, 12}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stream_landmark_replay_never_doubles_votes(spark, tmp_path):
    """THE landmark-specific replay hazard: digests tolerate
    re-appended rows (membership), but votes COUNT rows — a replayed
    micro-batch append would double every later probe's votes. The
    exists-check guard must keep the index rows unique per
    (item, t, lm), and a restart with the same checkpoint must not
    re-admit or duplicate anything."""
    table = f"lm_ingest_{uuid.uuid4().hex[:8]}"
    in_dir, decisions, ckpt = tmp_path / "in", tmp_path / "dec", tmp_path / "ckpt"
    _write_batch(spark, in_dir / "b0.parquet", [(1, _clip(0)), (2, _clip(5))], order=0)
    try:
        _run(spark, in_dir, table, decisions, ckpt)
        rows0 = spark.table(table).count()
        # restart with the SAME checkpoint and no new files: no-op
        _run(spark, in_dir, table, decisions, ckpt)
        assert spark.table(table).count() == rows0
        # simulate a replay of batch 0 (crash after index commit,
        # before checkpoint commit): a FRESH checkpoint re-runs the
        # batch; the exists-check must skip the second append
        _run(spark, in_dir, table, decisions, tmp_path / "ckpt2")
        assert spark.table(table).count() == rows0
        dup = (
            spark.table(table)
            .groupBy("item_id", "t", "lm")
            .count()
            .where("count > 1")
            .count()
        )
        assert dup == 0
        # decisions unchanged (dynamic partition overwrite)
        out = {r["item_id"]: r["admitted"]
               for r in spark.read.parquet(str(decisions)).collect()}
        assert out == {1: True, 2: True}
        # and a later probe still sees single votes: a padded copy of
        # clip 1 matches with exactly 6 votes (4 tone frames -> 6
        # landmarks), not 12
        from easydb_server_spark.operators.audiofp import (
            audio_fingerprint,
            audio_landmarks_timed,
            landmark_search,
        )

        probe_blob = spark.createDataFrame(
            [(99, _clip(0, off=1))], "item_id long, payload binary"
        )
        lms = audio_landmarks_timed(
            audio_fingerprint(probe_blob, "payload", "item_id")
        )
        hit = landmark_search(
            spark.table(table).select("item_id", "t", "lm"), lms, min_votes=3
        ).collect()
        assert [(r["match_id"], r["votes"]) for r in hit] == [(1, 6)]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stream_landmark_compact_preserves_results(spark, tmp_path):
    """Compaction of a streaming-grown index (batch_id partitions):
    row count only drops if duplicates existed (none, by the replay
    guard), batch_id partitioning survives, and probes are unchanged."""
    table = f"lm_ingest_{uuid.uuid4().hex[:8]}"
    in_dir, decisions, ckpt = tmp_path / "in", tmp_path / "dec", tmp_path / "ckpt"
    _write_batch(spark, in_dir / "b0.parquet", [(1, _clip(0))], order=0)
    _write_batch(spark, in_dir / "b1.parquet", [(2, _clip(5))], order=1)
    try:
        _run(spark, in_dir, table, decisions, ckpt)
        from easydb_server_spark.operators.audiofp import compact_landmark_index

        before = spark.table(table).count()
        kept = compact_landmark_index(spark, table, n_buckets=4)
        assert kept == before
        assert "batch_id" in spark.table(table).columns
        assert spark.table(table).count() == before
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
