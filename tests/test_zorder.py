"""Z-order clustering (operators/zorder.py): key correctness locked by
the conformance oracle; this file locks the LAYOUT claim — files
written in Morton order carry tight min/max stats on BOTH clustered
columns, so a predicate on the second dimension skips most of the
data, where a single-column sort cannot skip at all."""

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F


def _files_overlapping(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(files whose [min,max] stats for `col` intersect [lo, hi), total
    files) — the exact per-row-group test Spark's parquet reader uses
    to decide what to skip."""
    files = glob.glob(f"{path}/part-*.parquet")
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        overlap = False
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    if c.statistics.min < hi and c.statistics.max >= lo:
                        overlap = True
        if overlap:
            hit += 1
    return hit, len(files)


def test_zorder_layout_skips_on_the_second_dimension(spark, tmp_path):
    from easydb_server_spark.operators.zorder import zorder_write

    n = 200_000
    d = spark.range(n).select(
        (F.col("id") % 1000).alias("user_id"),
        ((F.col("id") * 7919) % 100_000).alias("value"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    flat = str(tmp_path / "flat")
    zord = str(tmp_path / "zord")
    # single-dimension layout: sorted (and range-split) on user_id only
    (
        d.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(flat)
    )
    zorder_write(d, ["user_id", "value"], zord, n_files=16, bits=16)

    pred = (F.col("value") >= 10_000) & (F.col("value") < 11_000)
    expect = d.where(pred).count()
    # same answer from both layouts
    assert spark.read.parquet(flat).where(pred).count() == expect
    assert spark.read.parquet(zord).where(pred).count() == expect
    # footer stats: the value predicate overlaps EVERY user-sorted file
    # (value spreads across all of them) but only a fraction of the
    # z-ordered files — the min/max test Spark's reader skips by
    hit_flat, n_flat = _files_overlapping(flat, "value", 10_000, 11_000)
    hit_zord, n_zord = _files_overlapping(zord, "value", 10_000, 11_000)
    assert hit_flat == n_flat == 16
    assert hit_zord <= n_zord // 2, (hit_zord, n_zord)


def test_zorder_key_is_monotone_in_each_dimension_quadrant(spark):
    """Coarse sanity on the interleave: the top interleaved bits split
    the plane into quadrants — points in the low/low quadrant must
    sort before points in the high/high quadrant."""
    from easydb_server_spark.operators.zorder import zorder_key

    d = spark.range(400).select(
        (F.col("id") % 20).alias("x"), (F.col("id") / 20).cast("long").alias("y")
    )
    rows = {(r.x, r.y): r.zkey for r in zorder_key(d, ["x", "y"], bits=8).collect()}
    assert rows[(0, 0)] == 0
    assert all(rows[(x, y)] < rows[(19, 19)] for x in range(10) for y in range(10) if (x, y) != (19, 19))
