"""Continuous distinct-count sketching (streaming/ingest.py
stream_distinct_sketches): estimates track exact distincts within the
HLL bound across incremental batches, and replay is byte-idempotent —
HLL insertion cannot change a register on re-observation, so no seq
bookkeeping exists to get wrong."""

import json

from easydb_server_spark.streaming.ingest import (
    read_sketch_store,
    stream_distinct_sketches,
)

_BOUND = 3 * 1.04 / (2**14) ** 0.5


def _write_events(path, ids):
    rows = [
        {"event_id": i, "ts": f"2024-01-01T00:{i % 60:02d}:00", "user_id": i % 700,
         "event_type": "click" if i % 2 == 0 else "view", "value": 1.0, "props": "{}"}
        for i in ids
    ]
    path.write_text("\n".join(json.dumps(r) for r in rows))


def _run(spark, src_dir, store, ckpt):
    from easydb_server_spark.streaming import stream_events_ndjson

    q = stream_distinct_sketches(
        stream_events_ndjson(spark, str(src_dir)), "user_id", "event_type",
        store, ckpt,
    )
    q.awaitTermination()


def test_stream_sketches_track_exact_distincts(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    _write_events(src / "b1.json", range(0, 1500))
    _run(spark, src, store, ckpt)
    est = {r.grp: r for r in read_sketch_store(spark, store).collect()}
    # ids 0..1499 -> users id%700: evens (click) cover 350 even + 350 odd... exact below
    exact = {
        g: len({i % 700 for i in range(1500) if ("click" if i % 2 == 0 else "view") == g})
        for g in ("click", "view")
    }
    for g in ("click", "view"):
        assert abs(est[g].distinct_estimate - exact[g]) <= _BOUND * exact[g] + 1

    # a second batch with overlapping users: union must track the TRUE
    # cumulative distinct, not the sum of per-batch distincts
    _write_events(src / "b2.json", range(1000, 2600))
    _run(spark, src, store, ckpt)
    est2 = {r.grp: r for r in read_sketch_store(spark, store).collect()}
    exact2 = {
        g: len({i % 700 for i in range(2600) if ("click" if i % 2 == 0 else "view") == g})
        for g in ("click", "view")
    }
    for g in ("click", "view"):
        assert abs(est2[g].distinct_estimate - exact2[g]) <= _BOUND * exact2[g] + 1
        assert est2[g].n_batches == 2
        # rows sum across batches (ids 1000-1499 recur as NEW events)
        all_events = list(range(1500)) + list(range(1000, 2600))
        assert est2[g].n_rows == sum(
            1 for i in all_events if ("click" if i % 2 == 0 else "view") == g
        )


def test_stream_sketch_replay_is_idempotent(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    store = str(tmp_path / "store")

    _write_events(src / "b1.json", range(0, 800))
    _run(spark, src, store, str(tmp_path / "ckpt1"))
    first = sorted(tuple(r) for r in read_sketch_store(spark, store).collect())

    # fresh checkpoint = full replay of the same files: partitions are
    # overwritten with identical sketches, estimates unchanged
    _run(spark, src, store, str(tmp_path / "ckpt2"))
    again = sorted(tuple(r) for r in read_sketch_store(spark, store).collect())
    assert again == first
