"""Funnel-detection stateful operator: unit semantics, batch over the
events table, and batch↔stream equivalence with state crossing
micro-batch boundaries (the property that justifies rows-only
conformance for a non-SQL-expressible operator)."""

import json

import pandas as pd
import pytest

from tests.conftest import SF_DIR


class TestMachine:
    def _df(self, rows):
        return pd.DataFrame(
            {"ts": [pd.Timestamp(t) for t, _ in rows], "event_type": [e for _, e in rows]}
        )

    def test_simple_completion(self):
        from easydb_server_spark.operators.stateful import _run_machine

        out, state = _run_machine(
            self._df([("2024-01-01 00:00", "signup"), ("2024-01-01 00:10", "click"),
                      ("2024-01-01 00:20", "purchase")]),
            3600, None,
        )
        assert len(out) == 1
        assert state == (None, None)

    def test_timeout_resets(self):
        from easydb_server_spark.operators.stateful import _run_machine

        out, _ = _run_machine(
            self._df([("2024-01-01 00:00", "signup"), ("2024-01-01 02:00", "click"),
                      ("2024-01-01 02:10", "purchase")]),
            3600, None,
        )
        assert out == []

    def test_purchase_requires_click_first(self):
        from easydb_server_spark.operators.stateful import _run_machine

        out, _ = _run_machine(
            self._df([("2024-01-01 00:00", "signup"), ("2024-01-01 00:10", "purchase")]),
            3600, None,
        )
        assert out == []

    def test_state_carries_over(self):
        from easydb_server_spark.operators.stateful import _run_machine

        out1, st = _run_machine(self._df([("2024-01-01 00:00", "signup")]), 3600, None)
        assert out1 == []
        out2, _ = _run_machine(
            self._df([("2024-01-01 00:10", "click"), ("2024-01-01 00:20", "purchase")]), 3600, st
        )
        assert len(out2) == 1


class TestBatch:
    def test_funnels_found_on_events_table(self, spark):
        from easydb_server_spark.operators.stateful import funnel_detection

        from easydb_server_spark.queries._util import load

        events = load(spark, SF_DIR, "events")
        # sf0.001 inter-event gaps average ~1.7 days per user, so a
        # 1-hour funnel never completes — use a 3-day window here
        out = funnel_detection(events, timeout_s=3 * 86400).collect()
        assert len(out) > 0
        for r in out:
            assert r.signup_ts <= r.purchase_ts


@pytest.fixture()
def two_batch_stream(tmp_path):
    """Two NDJSON files whose funnel spans the file boundary."""
    d = tmp_path / "in"
    d.mkdir()
    batch1 = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7, "event_type": "signup", "value": 0.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:05:00", "user_id": 7, "event_type": "click", "value": 0.0, "props": "{}"},
    ]
    batch2 = [
        {"event_id": 3, "ts": "2024-01-01T00:10:00", "user_id": 7, "event_type": "purchase", "value": 0.0, "props": "{}"},
        {"event_id": 4, "ts": "2024-01-01T00:20:00", "user_id": 8, "event_type": "purchase", "value": 0.0, "props": "{}"},
    ]
    import os
    import time

    (d / "a_batch1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    (d / "b_batch2.json").write_text("\n".join(json.dumps(r) for r in batch2))
    # file-source micro-batch order follows modification time: make it
    # unambiguous that batch1 precedes batch2
    now = time.time()
    os.utime(d / "a_batch1.json", (now - 60, now - 60))
    os.utime(d / "b_batch2.json", (now, now))
    return d


def test_stream_state_crosses_microbatches(spark, two_batch_stream, tmp_path):
    from easydb_server_spark.operators.stateful import funnel_detection_stream
    from easydb_server_spark.streaming.events import EVENT_SCHEMA

    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force one file per micro-batch
        .json(str(two_batch_stream))
    )
    out = funnel_detection_stream(src, timeout_s=3600)
    name = "funnel_stream_test"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # signup+click in batch 1, purchase in batch 2: state must survive
    # the micro-batch boundary for the funnel to complete
    assert len(rows) == 1
    assert rows[0].user_id == 7


def test_stream_equals_batch_on_events_table(spark, tmp_path):
    """Differential: the streaming stateful operator over the events
    table (single batch) returns exactly the batch operator's result."""
    from easydb_server_spark.operators.stateful import (
        funnel_detection,
        funnel_detection_stream,
    )
    from easydb_server_spark.queries._util import load

    batch_events = load(spark, SF_DIR, "events")
    expected = {
        (r.user_id, r.signup_ts, r.purchase_ts)
        for r in funnel_detection(batch_events, 3600).collect()
    }

    from easydb_server_spark.queries.streamq import _events_stream

    out = funnel_detection_stream(_events_stream(spark, SF_DIR), 3600)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_equiv")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.signup_ts, r.purchase_ts)
        for r in spark.sql("SELECT * FROM funnel_equiv").collect()
    }
    assert got == expected
