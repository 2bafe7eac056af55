"""Regular-grid resampling with last-observation-carried-forward.

The classic time-series gap-fill: project an irregular event stream
onto a fixed step grid (hourly, minutely) per key, carrying the most
recent observation forward — what dashboards, feature pipelines, and
downsampling jobs consume. Complements the existing as-of join
(`operators/asof.py`): as-of aligns one stream to another's
timestamps; this aligns a stream to a synthetic clock.

Reference has no timeseries surface (SURVEY.md §2 streaming note);
beyond-parity design.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def resample_locf(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """(key, grid_ts, value_locf) for every grid point between the
    stream's (step-truncated) min and max timestamps — value_locf is
    the latest observation at or before the grid point (null until the
    key's first event).

    The union-and-window formulation: grid markers interleave with
    real events in one per-key ordered pass, and
    ``last(value, ignorenulls=True)`` over the unbounded-preceding
    frame fills each marker. Ties at identical timestamps order by
    (is_grid, value) so the fill is deterministic and engine-portable
    — an engine-independent oracle replays it exactly.

    Scale shape: grid bounds are two broadcast scalars; the per-key
    grid generates from a `sequence` expression (never a driver loop);
    the single shuffle is on ``key_col`` and the window's state is one
    running value per key. Grid size is span/step per key — for very
    long spans, partition the time range first (the same
    bucket-by-time trade as the range join).
    """
    from pyspark.sql import Window

    k, t, v = F.col(key_col), F.col(ts_col), F.col(value_col)
    keys = df.select(k.alias("k")).distinct()
    bounds = df.agg(
        F.date_trunc("hour", F.min(t)).alias("t0"),
        F.date_trunc("hour", F.max(t)).alias("t1"),
    )
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        "k", F.explode(F.expr(f"sequence(t0, t1, interval {step})")).alias("gts")
    )
    ev = df.select(
        k.alias("k"), t.alias("gts"), v.cast("double").alias("v"), F.lit(0).alias("is_grid")
    )
    markers = grid.select(
        "k", "gts", F.lit(None).cast("double").alias("v"), F.lit(1).alias("is_grid")
    )
    w = (
        Window.partitionBy("k")
        .orderBy("gts", "is_grid", "v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.unionAll(markers)
        .withColumn("value_locf", F.last("v", ignorenulls=True).over(w))
        .where(F.col("is_grid") == 1)
        .select(
            F.col("k").alias(key_col),
            F.col("gts").alias("grid_ts"),
            F.round("value_locf", 2).alias("value_locf"),
        )
    )


def resample_interp(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Linear-interpolation companion to :func:`resample_locf`:
    each grid point takes the time-weighted blend of its nearest
    observations on either side — v0 + (v1−v0)·(g−t0)/(t1−t0) — and
    null where a side is missing (before the key's first event /
    after its last). A grid point landing exactly on an event takes
    that event's value.

    Same union-and-window scale shape as LOCF, with one backward and
    one forward frame over the single per-key ordered pass: the
    carried state is one (t, v) pair per direction. Null-valued
    observations are dropped up front so the backward/forward
    (timestamp, value) pairs always come from the same row — the
    property that lets an engine-independent oracle replay the fill
    with plain LAST_VALUE/FIRST_VALUE IGNORE NULLS windows.
    """
    from pyspark.sql import Window

    k, t, v = F.col(key_col), F.col(ts_col), F.col(value_col)
    base = df.where(v.isNotNull())
    keys = base.select(k.alias("k")).distinct()
    bounds = base.agg(
        F.date_trunc("hour", F.min(t)).alias("t0"),
        F.date_trunc("hour", F.max(t)).alias("t1"),
    )
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        "k", F.explode(F.expr(f"sequence(t0, t1, interval {step})")).alias("gts")
    )
    ev = base.select(
        k.alias("k"),
        t.alias("gts"),
        F.unix_micros(t).alias("et"),
        v.cast("double").alias("v"),
        F.lit(0).alias("is_grid"),
    )
    markers = grid.select(
        "k",
        "gts",
        F.lit(None).cast("long").alias("et"),
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("is_grid"),
    )
    back = (
        Window.partitionBy("k")
        .orderBy("gts", "is_grid", "v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("k")
        .orderBy("gts", "is_grid", "v")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    g_us = F.unix_micros(F.col("gts"))
    t0, v0 = F.last("et", ignorenulls=True).over(back), F.last("v", ignorenulls=True).over(back)
    t1, v1 = F.first("et", ignorenulls=True).over(fwd), F.first("v", ignorenulls=True).over(fwd)
    interp = F.when(t0 == g_us, v0).otherwise(
        v0 + (v1 - v0) * (g_us - t0).cast("double") / (t1 - t0).cast("double")
    )
    return (
        ev.unionAll(markers)
        .select(
            "k",
            "gts",
            "is_grid",
            F.round(interp, 4).alias("value_interp"),
        )
        .where(F.col("is_grid") == 1)
        .select(
            F.col("k").alias(key_col),
            F.col("gts").alias("grid_ts"),
            "value_interp",
        )
    )
