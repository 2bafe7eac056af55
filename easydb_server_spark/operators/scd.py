"""Slowly-changing-dimension (SCD Type 2, Kimball) history over
DataFrames — the warehouse-side counterpart of the repo's streaming
state operators: turn an event log carrying an attribute per key into
versioned validity intervals (valid_from / valid_to / is_current), and
fold new batches into an existing history WITHOUT rescanning it.

This is the "MERGE INTO ... WHEN MATCHED" pattern lakehouse engines
special-case, expressed as plain declarative DataFrame ops so Catalyst
owns the physical strategy. Two entry points:

- :func:`scd2_build` — full history from scratch: one shuffle on the
  key, two window passes (change detection, then interval closing).
- :func:`scd2_merge` — incremental: the existing dimension plus a new
  event batch. Only keys PRESENT in the batch are touched (left-semi
  restrict); untouched keys' rows pass through by reference, so with
  key-partitioned storage a writer overwrites only touched partitions.
  Contract: batch events are at-or-after the open rows' ``valid_from``
  (the natural micro-batch contract; same-timestamp ties resolve
  seed-first). The locked invariant (pytest):
  ``scd2_merge(scd2_build(events ≤ T), events > T)`` equals
  ``scd2_build(all events)`` bit-for-bit.

Semantics details an oracle must agree on (and the DuckDB oracle
replays): events order by (ts, tie) per key; a version starts at the
first event or wherever the attribute IS DISTINCT FROM its
predecessor (null-safe — null is a real attribute value); a version's
``valid_to`` is the NEXT version's ``valid_from`` (half-open
intervals, the standard convention); the last version per key is
current.

Scale shape: everything is keyed windows over the key column — one
hash shuffle per pass, no joins wider than key-width, nothing
collected. The merge's rebuild side is bounded by the BATCH's key
set: seed rows (one open row per touched key) union the batch, so
per-batch cost is O(touched history tails + batch), never O(dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_OUT_COLS = ("key", "attr", "valid_from", "valid_to", "is_current")


def _history(events: DataFrame) -> DataFrame:
    """Shared core: (key, attr, ts, tie) events -> SCD2 rows. ``tie``
    may be null; nulls order FIRST so merge seeds beat same-timestamp
    batch events."""
    w = Window.partitionBy("key").orderBy(F.asc("ts"), F.asc_nulls_first("tie"))
    marked = events.select(
        "key",
        "attr",
        "ts",
        "tie",
        F.row_number().over(w).alias("_rn"),
        F.lag("attr").over(w).alias("_prev"),
    )
    changes = marked.where(
        (F.col("_rn") == 1) | ~F.col("attr").eqNullSafe(F.col("_prev"))
    )
    w2 = Window.partitionBy("key").orderBy(F.asc("ts"), F.asc_nulls_first("tie"))
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "key",
        "attr",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_build(
    df: DataFrame, key_col: str, attr_col: str, ts_col: str, tie_col: str
) -> DataFrame:
    """Full SCD2 history of ``attr_col`` per ``key_col`` from an event
    log. ``tie_col`` breaks same-timestamp ordering deterministically
    (use the event's unique id). Returns
    (key, attr, valid_from, valid_to, is_current)."""
    ev = df.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("ts"),
        F.col(tie_col).alias("tie"),
    )
    return _history(ev)


def scd2_merge(
    dim: DataFrame,
    batch: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Fold a new event batch into an existing SCD2 dimension (the
    output shape of :func:`scd2_build`). Untouched keys pass through;
    for touched keys, CLOSED versions pass through and the open
    version is re-derived alongside the batch — it stays open if the
    batch never changes the attribute, closes at the first change
    otherwise. Batch keys absent from the dimension build fresh
    histories.

    NULL is a real key value (matching :func:`scd2_build`, where the
    window groups all null keys into one history): the touched /
    untouched split uses NULL-SAFE equality — still an equi-join
    condition Spark hash-joins — so a null-key batch folds into the
    existing null-key history instead of duplicating it (a plain
    semi/anti join never matches null, which would pass the old rows
    through as 'untouched' while the batch rebuilt a fresh overlapping
    null-key history, breaking the merge ≡ rebuild invariant)."""
    bkeys = batch.select(F.col(key_col).alias("_bkey")).distinct()
    null_safe = F.col("key").eqNullSafe(F.col("_bkey"))
    untouched = dim.join(bkeys, null_safe, "left_anti")
    touched = dim.join(bkeys, null_safe, "left_semi")
    closed = touched.where(~F.col("is_current"))
    # the open row becomes the seed event: its attr at its valid_from,
    # null tie so it orders before any same-timestamp batch event
    seed = touched.where(F.col("is_current")).select(
        "key",
        "attr",
        F.col("valid_from").alias("ts"),
        F.lit(None).cast(batch.schema[tie_col].dataType).alias("tie"),
    )
    bev = batch.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("ts"),
        F.col(tie_col).alias("tie"),
    )
    rebuilt = _history(seed.unionByName(bev))
    return untouched.select(*_OUT_COLS).unionByName(
        closed.select(*_OUT_COLS)
    ).unionByName(rebuilt.select(*_OUT_COLS))
