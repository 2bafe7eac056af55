"""HLL distinct-count sketches (operators/sketch.py): error bounds vs
exact counts, determinism, and append-mergeability — the principled
substitutes for a value oracle (estimates are implementation-defined,
like agg_approx_distinct)."""

import pyspark.sql.functions as F

from easydb_server_spark.operators.sketch import (
    distinct_sketches,
    sketch_append,
    union_estimate,
)

# 3x the HLL relative standard error at lg_k=14 (1.04/sqrt(2^14))
_BOUND = 3 * 1.04 / (2**14) ** 0.5


def _events(spark, n=20_000, mod=3_000, shards=4):
    return spark.range(n).selectExpr(f"id % {shards} AS shard", f"id % {mod} AS user")


def test_estimates_within_error_bound(spark):
    df = _events(spark)
    rows = distinct_sketches(df, "user", "shard").collect()
    assert len(rows) == 4
    for r in rows:
        exact = df.where(F.col("shard") == r.grp).select("user").distinct().count()
        assert abs(r.estimate - exact) <= _BOUND * exact + 1
        assert len(bytes(r.sketch)) > 0


def test_union_estimates_global_distinct(spark):
    df = _events(spark, mod=2_500)
    sk = distinct_sketches(df, "user", "shard")
    (row,) = union_estimate(sk).collect()
    assert row.n_sketches == 4
    assert abs(row.distinct_estimate - 2_500) <= _BOUND * 2_500 + 1


def test_estimates_are_deterministic(spark):
    df = _events(spark)
    a = sorted(tuple(r) for r in distinct_sketches(df, "user", "shard").collect())
    b = sorted(tuple(r) for r in distinct_sketches(df, "user", "shard").collect())
    assert [t[0] for t in a] == [t[0] for t in b]
    assert [t[2] for t in a] == [t[2] for t in b]  # estimates identical


def test_append_equals_scratch_rebuild_bound(spark):
    # day-1 table + day-2 batch via sketch_append must estimate the
    # TRUE union within bound — history is never rescanned
    day1 = spark.range(0, 12_000).selectExpr("id % 2 AS shard", "id % 2000 AS user")
    day2 = spark.range(6_000, 20_000).selectExpr("id % 2 AS shard", "(id % 1500) + 1000 AS user")
    store = distinct_sketches(day1, "user", "shard")
    merged = sketch_append(store, day2, "user", "shard")
    rows = {r.grp: r for r in merged.collect()}
    both = day1.unionByName(day2)
    for grp in (0, 1):
        exact = both.where(F.col("shard") == grp).select("user").distinct().count()
        got = rows[grp].estimate
        assert abs(got - exact) <= _BOUND * exact + 1
        assert rows[grp].n_rows == both.where(F.col("shard") == grp).count()


def test_append_is_associative_in_estimate(spark):
    # (A+B)+C and A+(B+C) read the same estimates: union order is
    # irrelevant, which is what makes the store replay-safe
    parts = [
        spark.range(i * 3000, (i + 1) * 3000).selectExpr("0 AS shard", "id % 4000 AS user")
        for i in range(3)
    ]
    ab_c = sketch_append(
        sketch_append(distinct_sketches(parts[0], "user", "shard"), parts[1], "user", "shard"),
        parts[2], "user", "shard",
    )
    a_bc = sketch_append(
        sketch_append(distinct_sketches(parts[2], "user", "shard"), parts[1], "user", "shard"),
        parts[0], "user", "shard",
    )
    (x,) = ab_c.collect()
    (y,) = a_bc.collect()
    assert x.estimate == y.estimate and x.n_rows == y.n_rows


# ---- ann_recall (similarity.py) sanity: full probe = perfect recall ----


def test_ann_recall_full_probe_is_perfect(spark):
    import pyspark.sql.functions as F

    from easydb_server_spark.operators.similarity import ann_recall

    from easydb_server_spark.queries._util import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.where(F.col("vec_id") < 5)
    # nprobe = n_cells: every cell probed -> IVF degenerates to exact
    rows = ann_recall(e, q, "embedding", "vec_id", k=3, n_cells=4, nprobe=4).collect()
    assert len(rows) == 5
    assert all(r.recall == 1.0 and r.n_hits == 3 for r in rows)


def test_ann_recall_bounded_and_deterministic(spark):
    import pyspark.sql.functions as F

    from easydb_server_spark.operators.similarity import ann_recall
    from easydb_server_spark.queries._util import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.where(F.col("vec_id") < 8)
    a = sorted(tuple(r) for r in ann_recall(e, q, "embedding", "vec_id", k=3, n_cells=16).collect())
    b = sorted(tuple(r) for r in ann_recall(e, q, "embedding", "vec_id", k=3, n_cells=16).collect())
    assert a == b
    assert all(0.0 <= t[3] <= 1.0 for t in a)


# ---- compression_ratio (text.py): the rows-only entry's substitutes ----


def test_compression_ratio_discriminates(spark):
    from easydb_server_spark.operators.text import compression_ratio

    import random

    rng = random.Random(7)
    rand_text = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(2000))
    docs = spark.createDataFrame(
        [
            (1, "spam " * 400),                      # highly repetitive
            (2, "the quick brown fox jumps over the lazy dog. " * 44),
            (3, rand_text),                           # near-incompressible
            (4, None),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in compression_ratio(docs, "text", "doc_id").collect()}
    assert rows[1].ratio < rows[2].ratio < rows[3].ratio
    assert rows[1].ratio < 0.05 and rows[3].ratio > 0.5
    assert rows[4].ratio is None and rows[4].raw_bytes is None


def test_compression_ratio_deterministic(spark):
    from easydb_server_spark.operators.text import compression_ratio
    from easydb_server_spark.queries._util import load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(tuple(r) for r in compression_ratio(d, "text", "doc_id").collect())
    b = sorted(tuple(r) for r in compression_ratio(d, "text", "doc_id").collect())
    assert a == b and len(a) == 500


# ---------------- Count-Min frequency sketch ----------------

from easydb_server_spark.operators.sketch import cm_build, cm_estimate, cm_merge  # noqa: E402


def _words(spark, n=8_000):
    # zipf-ish, ~90 distinct words: word w appears more often for
    # small w (sqrt compresses the id range toward low values)
    return spark.range(n).selectExpr(
        "CONCAT('w', CAST(SQRT(id % 90000) AS INT)) AS w"
    )


def test_cm_never_underestimates(spark):
    df = _words(spark)
    cm = cm_build(df, "w", depth=4, width=64)  # tiny width: collisions live
    true = df.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    j = true.join(cm_estimate(cm, true, "w", depth=4, width=64), "w")
    assert j.where(F.col("est") < F.col("c")).count() == 0


def test_cm_overestimate_bounded(spark):
    # standard bound: overestimate <= e*N/width with prob 1-(1/e)^depth;
    # assert the MEAN overestimate is well inside it (mean < 2N/width)
    df = _words(spark)
    n = df.count()
    width = 128
    cm = cm_build(df, "w", depth=4, width=width)
    true = df.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    j = true.join(cm_estimate(cm, true, "w", depth=4, width=width), "w")
    mean_over = j.agg(F.avg(F.col("est") - F.col("c"))).first()[0]
    assert mean_over <= 2 * n / width


def test_cm_merge_equals_build_on_union(spark):
    a = spark.range(0, 3000).selectExpr("CONCAT('w', id % 200) AS w")
    b = spark.range(0, 2000).selectExpr("CONCAT('w', id % 150) AS w")
    merged = cm_merge(cm_build(a, "w", 4, 128), cm_build(b, "w", 4, 128))
    scratch = cm_build(a.unionByName(b), "w", 4, 128)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, scratch.collect())
    )


def test_cm_table_bounded_and_nulls_skipped(spark):
    df = spark.range(4000).selectExpr(
        "CASE WHEN id % 7 = 0 THEN NULL ELSE CONCAT('w', id % 500) END AS w"
    )
    cm = cm_build(df, "w", depth=3, width=64)
    assert cm.count() <= 3 * 64
    total = cm.where(F.col("r") == 0).agg(F.sum("cnt")).first()[0]
    assert total == df.where(F.col("w").isNotNull()).count()


def test_cm_estimate_broadcasts_sketch(spark):
    df = _words(spark, n=2000)
    cm = cm_build(df, "w", 4, 128)
    est = cm_estimate(cm, df.select("w").distinct(), "w", 4, 128)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_compression_invariants_hold_on_adversarial_texts(spark):
    """The three zlib invariants the driver-graded companion entry
    asserts as constant TRUE (roundtrip, doubling-subadditive,
    stored-block bound) must hold on pathological inputs, not just
    fixture prose — single char, all-same-char (extreme compressible),
    hex noise (incompressible), multi-byte UTF-8, and the 8192-char
    filter boundary."""
    import hashlib

    from easydb_server_spark.queries.llmops import q_text_compression_invariants

    noise = "".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(120)
    )  # 7680 chars of hex noise
    texts = [
        "a",
        "ab",
        "a" * 8192,
        noise,
        "héllo wörld ünïcode — ∑∆ " * 40,
        ("x y z " * 1366)[:8192],
    ]
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        out = q_text_compression_invariants(spark, td).collect()
    assert len(out) == len(texts)
    for r in out:
        assert r.roundtrip_exact and r.doubling_subadditive and r.within_deflate_bound, r
