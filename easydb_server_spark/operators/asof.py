"""Distributed as-of join (point-in-time join).

Neither the reference's DataFusion 47 surface (SURVEY.md §2.B "No
as-of / range-interval join primitives") nor Spark has an ASOF JOIN
primitive; this implements it as a composition of built-in operators —
the union + ordered-window trick:

1. tag probe rows (side=1) and quote rows (side=0) into one frame;
2. one shuffle on the join key; within each key, sort by (ts, side)
   and carry the quote row forward as ONE struct through a single
   ``last(..., ignorenulls)`` over an unbounded-preceding running
   frame — row-atomic by construction: all attached attributes come
   from the SAME quote row even when some of its attributes are NULL
   (independent per-column last() would mix rows there);
3. keep probe rows — each now holds the most recent quote at-or-before
   its timestamp.

Scale shape: exactly ONE shuffle (the window's partitionBy), no
range-condition row explosion, no broadcast requirement on either
side; skewed keys can reuse the salting pattern from operators/skew.py.
Spark's window sort spills via UnsafeExternalSorter, so per-key groups
larger than memory still complete.

Ties at equal timestamps are inclusive (quote at ts == probe ts
matches), same as DuckDB's ``ASOF JOIN ... ON q.ts <= p.ts`` oracle
semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    probe: DataFrame,
    quote: DataFrame,
    on: str,
    probe_ts: str,
    quote_ts: str,
    quote_cols: list[str],
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    quote_tiebreak: str | None = None,
) -> DataFrame:
    """For each probe row, attach the most recent quote row (per ``on``
    key) with quote_ts <= probe_ts (``direction="backward"``, the
    default) or the most IMMINENT quote with quote_ts >= probe_ts
    (``direction="forward"`` — the "next reading" lookup: next
    heartbeat after an alert, next fill after an order). Probe columns
    pass through; quote attribute columns arrive as ``asof_<name>``
    (NULL when no quote qualifies, or when it is further away than
    ``tolerance_seconds``).

    ``direction="forward"`` reuses the identical one-shuffle
    union+window plan with the window ordered on ``ts`` DESCENDING —
    the running ``last(..., ignorenulls)`` then carries the SMALLEST
    quote_ts >= probe_ts backward onto each probe. Equal timestamps
    stay inclusive in both directions.

    ``quote_tiebreak`` (a member of ``quote_cols``): when several
    quotes share the matching timestamp, pick the one with the
    SMALLEST tiebreak value — without it the winner among equal-ts
    quotes is partition-order dependent, which a conformance oracle
    can't replay. (The pre-r13 call sites run tie-free fixtures and
    keep the unspecified behavior.)
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    from pyspark.sql.types import StructField, StructType

    probe_out = [c for c in probe.columns]
    p_type = StructType([probe.schema[c] for c in probe_out])
    # The whole matching quote row travels as ONE struct (__qts + the
    # requested attribute columns), so a single last(ignorenulls) is
    # row-atomic: every asof_<c> comes from the same quote row even
    # when some of that row's attributes are NULL. (A struct built
    # from columns is non-null even if all its fields are, so probe
    # rows — a literal NULL struct — are the only rows ignorenulls
    # skips.)
    q_type = StructType(
        [StructField("__qts", quote.schema[quote_ts].dataType)]
        + [StructField(f"__q_{c}", quote.schema[c].dataType) for c in quote_cols]
    )
    tagged_p = probe.select(
        F.col(on).alias("__k"),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*probe_out).alias("__p"),
        F.lit(None).cast(q_type).alias("__q"),
    )
    tagged_q = quote.select(
        F.col(on).alias("__k"),
        F.col(quote_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(p_type).alias("__p"),
        F.struct(
            F.col(quote_ts).alias("__qts"),
            *[F.col(c).alias(f"__q_{c}") for c in quote_cols],
        ).alias("__q"),
    )

    ts_key = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    order_keys = [ts_key, F.col("__side").asc()]
    if quote_tiebreak is not None:
        # among equal-(ts, side) quote rows the running last() wins, so
        # descending tiebreak makes the SMALLEST value the winner —
        # NULLS FIRST so a NULL tiebreak LOSES to every non-null one
        # (Spark's desc default is NULLS LAST, which would let a NULL
        # tiebreak silently beat them all); probe rows carry a NULL
        # struct here and are separated by __side anyway
        order_keys.append(F.col("__q").getField(f"__q_{quote_tiebreak}").desc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = tagged_p.unionByName(tagged_q)
    filled = u.select(
        "__k",
        "__ts",
        "__side",
        "__p",
        F.last("__q", ignorenulls=True).over(w).alias("__qf"),
    ).where(F.col("__side") == 1)

    if tolerance_seconds is not None:
        gap = (
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__qf.__qts"))
            if direction == "backward"
            else F.unix_micros(F.col("__qf.__qts")) - F.unix_micros(F.col("__ts"))
        )
        in_tol = F.col("__qf").isNotNull() & (gap <= int(tolerance_seconds * 1_000_000))
        filled = filled.select(
            "__k",
            "__ts",
            "__p",
            F.when(in_tol, F.col("__qf")).alias("__qf"),
        )

    return filled.select(
        *[F.col(f"__p.{c}").alias(c) for c in probe_out],
        F.col("__qf.__qts").alias("asof_ts"),
        *[F.col(f"__qf.__q_{c}").alias(f"asof_{c}") for c in quote_cols],
    )
