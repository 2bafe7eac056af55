"""Structured Streaming over event streams (beyond-parity).

The reference is strictly request/response batch (SURVEY.md §2.B
"Streaming-only operators: None"); this module lifts the batch
time-series operators from queries/timeseries.py onto ``readStream``
unchanged — same ``window()``/``session_window()`` expressions,
plus watermarks for late data.
"""

from easydb_server_spark.streaming.events import (  # noqa: F401
    stream_events_ndjson,
    stream_stream_join,
    windowed_counts,
    sessionized,
)
