"""Custom stateful operator: funnel detection.

Semantics (per user, events in ts order): a funnel starts at a
``signup``; it completes when a ``click`` and then a ``purchase``
follow, all within ``timeout_s`` of the signup; completion emits
``(user_id, signup_ts, purchase_ts)`` and resets. A new signup while a
funnel is open is ignored; an expired funnel resets silently.

This sequential state machine is the canonical case the built-in
windowed aggregations *cannot* express (order-dependent transitions,
early reset) — exactly what ``applyInPandasWithState`` exists for
(SURVEY.md §7.2 M7 / the brief's custom-stateful-operator slot). The
driver records it as a rows-only check: there is no ANSI-SQL oracle
for it by construction; the correctness evidence is the batch/stream
equivalence test (tests/test_stateful.py).

Scale design: state per user is three small fields; groups distribute
by user_id hash; in streaming mode state lives in the state store and
is dropped on timeout — bounded by |active funnels|, not |events|.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id bigint, signup_ts timestamp, purchase_ts timestamp"
STATE_SCHEMA = "signup_us bigint, clicked boolean"

FUNNEL_STEPS = ("signup", "click", "purchase")


def _run_machine(rows: pd.DataFrame, timeout_s: float, state: tuple | None):
    """Advance the funnel state machine over ts-ordered rows.

    Returns (completions, new_state); state = (signup_us, clicked).
    Pure function — shared verbatim by the batch and streaming paths,
    so equivalence is by construction.
    """
    signup_us, clicked = state if state else (None, None)
    out = []
    for ts, etype in zip(rows["ts"], rows["event_type"]):
        ts_us = int(pd.Timestamp(ts).value // 1000)
        if signup_us is not None and ts_us > signup_us + timeout_s * 1_000_000:
            signup_us, clicked = None, None  # funnel expired
        if etype == "signup":
            if signup_us is None:
                signup_us, clicked = ts_us, False
        elif etype == "click":
            if signup_us is not None:
                clicked = True
        elif etype == "purchase":
            if signup_us is not None and clicked:
                out.append((signup_us, ts_us))
                signup_us, clicked = None, None
    return out, (signup_us, clicked)


def funnel_detection(events: DataFrame, timeout_s: float = 3600.0) -> DataFrame:
    """Batch funnel detection: applyInPandas per user (full history in
    one group — fine in batch, where the group is bounded by the
    partition)."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        completions, _ = _run_machine(pdf, timeout_s, None)
        uid = pdf["user_id"].iloc[0]
        return pd.DataFrame(
            [
                {
                    "user_id": uid,
                    "signup_ts": pd.Timestamp(s, unit="us"),
                    "purchase_ts": pd.Timestamp(p, unit="us"),
                }
                for s, p in completions
            ],
            columns=["user_id", "signup_ts", "purchase_ts"],
        )

    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandas(per_user, OUTPUT_SCHEMA)
    )


def funnel_detection_stream(events: DataFrame, timeout_s: float = 3600.0) -> DataFrame:
    """Streaming funnel detection: applyInPandasWithState — the same
    state machine, with funnel state carried across micro-batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def per_user_stateful(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        prev = state.get if state.exists else None
        if prev is not None:
            prev = (prev[0] if prev[0] >= 0 else None, prev[1])
        completions = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            got, prev = _run_machine(pdf, timeout_s, prev)
            completions.extend(got)
        signup_us, clicked = prev if prev else (None, None)
        state.update((signup_us if signup_us is not None else -1, bool(clicked)))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "signup_ts": pd.Timestamp(s, unit="us"),
                    "purchase_ts": pd.Timestamp(p, unit="us"),
                }
                for s, p in completions
            ],
            columns=["user_id", "signup_ts", "purchase_ts"],
        )

    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            per_user_stateful,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
