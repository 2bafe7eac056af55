"""SCD Type-2 history (operators/scd.py): interval well-formedness,
null-safe change detection, same-timestamp tie determinism, and the
incremental invariant — scd2_merge(dim@T, batch>T) equals the
from-scratch rebuild bit-for-bit."""

import pyspark.sql.functions as F

from easydb_server_spark.operators.scd import scd2_build, scd2_merge

COLS = ("key", "attr", "ts", "tie")


def _ev(spark, rows):
    return spark.createDataFrame(
        [(k, a, float(t), i) for i, (k, a, t) in enumerate(rows)],
        "key string, attr string, ts double, tie long",
    )


def _hist(df):
    return sorted(map(tuple, df.collect()))


def test_basic_versions_and_current_flag(spark):
    ev = _ev(spark, [("u1", "a", 1), ("u1", "a", 2), ("u1", "b", 3), ("u2", "x", 1)])
    rows = {
        (r.key, r.attr): r for r in scd2_build(ev, *COLS).collect()
    }
    assert rows[("u1", "a")].valid_from == 1.0
    assert rows[("u1", "a")].valid_to == 3.0  # repeat at t=2 is NOT a version
    assert rows[("u1", "a")].is_current is False
    assert rows[("u1", "b")].is_current and rows[("u1", "b")].valid_to is None
    assert rows[("u2", "x")].is_current


def test_intervals_chain_and_one_current_per_key(spark):
    ev = _ev(
        spark,
        [("u", c, t) for t, c in enumerate("aabbccaab")]
        + [("v", c, t) for t, c in enumerate("xyxyx")],
    )
    h = scd2_build(ev, *COLS).toPandas()
    for key, grp in h.groupby("key"):
        g = grp.sort_values("valid_from").reset_index(drop=True)
        assert g.is_current.sum() == 1 and bool(g.is_current.iloc[-1])
        # half-open chain: each valid_to is the next valid_from
        assert list(g.valid_to[:-1]) == list(g.valid_from[1:])
        # consecutive versions always differ
        assert all(g.attr[i] != g.attr[i + 1] for i in range(len(g) - 1))


def test_null_attr_is_a_real_value(spark):
    ev = _ev(spark, [("u", "a", 1), ("u", None, 2), ("u", None, 3), ("u", "a", 4)])
    h = scd2_build(ev, *COLS).orderBy("valid_from").collect()
    assert [r.attr for r in h] == ["a", None, "a"]
    assert [r.valid_from for r in h] == [1.0, 2.0, 4.0]


def test_same_timestamp_ties_resolve_by_tie_col(spark):
    ev = spark.createDataFrame(
        [("u", "a", 1.0, 10), ("u", "b", 1.0, 5)],
        "key string, attr string, ts double, tie long",
    )
    h = scd2_build(ev, *COLS).orderBy("valid_from", "attr").collect()
    # tie=5 ("b") orders first, so "a" is the later (current) version
    cur = [r.attr for r in h if r.is_current]
    assert cur == ["a"]


def test_merge_equals_rebuild_at_every_cut(spark):
    rows = (
        [("u1", c, t) for t, c in enumerate("aabcbbca")]
        + [("u2", c, t) for t, c in enumerate("zzzzyy")]
        + [("u3", "q", 0), ("u3", "q", 5)]
    )
    ev = _ev(spark, rows)
    full = _hist(scd2_build(ev, *COLS))
    for cut in (0.5, 2.5, 4.5, 6.5):
        dim = scd2_build(ev.where(F.col("ts") <= cut), *COLS)
        merged = scd2_merge(dim, ev.where(F.col("ts") > cut), *COLS)
        assert _hist(merged) == full, f"cut={cut}"


def test_merge_handles_new_keys_and_no_change_batches(spark):
    old = _ev(spark, [("u1", "a", 1), ("u1", "b", 2)])
    dim = scd2_build(old, *COLS)
    # batch: u1 unchanged attr (no new version), u9 brand new
    batch = spark.createDataFrame(
        [("u1", "b", 3.0, 100), ("u9", "k", 3.0, 101)],
        "key string, attr string, ts double, tie long",
    )
    merged = scd2_merge(dim, batch, *COLS)
    both = old.unionByName(batch.select("key", "attr", "ts", "tie"))
    assert _hist(merged) == _hist(scd2_build(both, *COLS))
    got = {(r.key, r.attr): r for r in merged.collect()}
    assert got[("u1", "b")].valid_from == 2.0  # open row kept its start
    assert got[("u9", "k")].is_current


def test_merge_touches_only_batch_keys(spark):
    # untouched keys' rows pass through: the rebuild side is
    # left-semi-restricted to batch keys
    old = _ev(spark, [("a", "x", 1), ("b", "y", 1), ("c", "z", 1)])
    dim = scd2_build(old, *COLS)
    batch = spark.createDataFrame(
        [("a", "x2", 2.0, 50)], "key string, attr string, ts double, tie long"
    )
    merged = scd2_merge(dim, batch, *COLS)
    keys = {r.key for r in merged.where(~F.col("is_current")).collect()}
    assert keys == {"a"}  # only the touched key gained a closed version
    assert merged.count() == 4


def test_merge_folds_null_keys_into_existing_null_history(spark):
    """NULL is a real key value: a null-key batch must extend the
    existing null-key history (null-safe semi/anti split), not pass it
    through untouched while building a duplicate overlapping one."""
    old = spark.createDataFrame(
        [(None, "a", 1.0, 0), (None, "a", 2.0, 1), ("u1", "x", 1.0, 2)],
        "key string, attr string, ts double, tie long",
    )
    dim = scd2_build(old, *COLS)
    batch = spark.createDataFrame(
        [(None, "b", 3.0, 100)], "key string, attr string, ts double, tie long"
    )
    merged = scd2_merge(dim, batch, *COLS)
    both = old.unionByName(batch)

    def hist(df):  # null keys sort first
        return sorted(map(tuple, df.collect()), key=lambda t: ((t[0] is not None, t[0]), t[2]))

    assert hist(merged) == hist(scd2_build(both, *COLS))
    null_rows = [r for r in merged.collect() if r.key is None]
    assert len(null_rows) == 2  # a@[1,3) closed, b@[3,∞) current
    assert sum(r.is_current for r in null_rows) == 1
