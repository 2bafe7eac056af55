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
