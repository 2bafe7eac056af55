"""ts_twap — time-weighted average over irregular samples.

The conformance entry runs on the fixture; these pin the SEMANTICS on
handwritten boundary rows — exact LOCF arithmetic, equal-timestamp
ties (where the event_id tie-break decides which value carries the
following gap), all-one-instant users (den=0, excluded), and the
Spark-vs-DuckDB agreement on exactly those rows.
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    """rows: (event_id, seconds_offset, user_id, value)."""
    base = datetime.datetime(2024, 1, 1)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + datetime.timedelta(seconds=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    d = tmp_path / "twap_fixture"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def test_locf_weighted_mean_exact(spark, tmp_path):
    from easydb_server_spark.queries.timeseries import q_ts_twap

    # user 1: v=10 holds 10s, v=20 holds 20s -> twap = 500/30 = 16.666667
    # user 2: single event -> no segment -> excluded
    # user 3: two events at ONE instant -> den=0 -> excluded
    rows = [
        (1, 0, 1, 10.0), (2, 10, 1, 20.0), (3, 30, 1, 0.0),
        (4, 0, 2, 5.0),
        (5, 7, 3, 1.0), (6, 7, 3, 2.0),
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["user_id"]: (r["n_segments"], r["twap_value"]) for r in q_ts_twap(spark, sf).collect()}
    assert set(got) == {1}
    assert got[1] == (2, 16.666667)


def test_equal_ts_tiebreak_is_event_id_ordered(spark, tmp_path):
    from easydb_server_spark.queries.timeseries import q_ts_twap

    # two values at t=0 (ids 1 then 2): id 1's segment is the 0-width
    # tie, id 2's value (40) carries the 10s gap -> twap = 40
    rows = [(1, 0, 1, 8.0), (2, 0, 1, 40.0), (3, 10, 1, 0.0)]
    sf = _write_events(tmp_path, rows)
    got = q_ts_twap(spark, sf).collect()
    assert len(got) == 1
    assert got[0]["n_segments"] == 2  # the dt=0 tie segment still counts
    assert got[0]["twap_value"] == 40.0


def test_matches_duckdb_on_boundary_rows(spark, tmp_path):
    """Mini differential on the handwritten rows (ties, negatives,
    single-instant users) — the same comparison the driver runs."""
    from easydb_server_spark.compare import canon_frame
    from easydb_server_spark.queries import REGISTRY
    from easydb_server_spark.queries.timeseries import q_ts_twap

    rows = [
        (1, 0, 1, 10.0), (2, 10, 1, -20.5), (3, 30, 1, 0.0),
        (4, 0, 2, 5.25), (5, 0, 2, 6.75), (6, 100, 2, 1.0),
        (7, 7, 3, 3.0),
    ]
    sf = _write_events(tmp_path, rows)
    got = canon_frame(q_ts_twap(spark, sf).toPandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = canon_frame(con.execute(REGISTRY["ts_twap"][1]).df())
    assert got == want
