"""Bloom membership filter (operators/bloom.py): the no-false-negative
guarantee (the property that makes the dedup pre-filter
result-preserving), measured false-positive rate vs the analytic
bound, mergeability, broadcast plan discipline, and admit-list
equivalence with the plain incremental dedup."""

import math

import pyspark.sql.functions as F

from easydb_server_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_prefilter_admits,
    bloom_probe,
)
from easydb_server_spark.operators.dedup import incremental_dedup

M, K, SEED = 4096, 4, "t1"


def _keys(spark, lo, hi, name="k"):
    return spark.range(lo, hi).selectExpr(f"CONCAT('key-', id) AS {name}")


def test_no_false_negatives(spark):
    members = _keys(spark, 0, 500)
    bl = bloom_build(members, "k", M, K, SEED)
    probed = bloom_probe(
        members.withColumn("id", F.monotonically_increasing_id()), "k", bl, "id", M, K, SEED
    )
    assert probed.where(~F.col("maybe_member")).count() == 0


def test_false_positive_rate_within_bound(spark):
    n = 500
    bl = bloom_build(_keys(spark, 0, n), "k", M, K, SEED)
    outsiders = _keys(spark, 10_000, 12_000)
    probed = bloom_probe(
        outsiders.withColumn("id", F.monotonically_increasing_id()), "k", bl, "id", M, K, SEED
    )
    fp = probed.where(F.col("maybe_member")).count()
    # analytic rate (1 - e^{-kn/m})^k with generous slack (4x + 5)
    rate = (1 - math.exp(-K * n / M)) ** K
    assert fp <= 4 * rate * 2_000 + 5


def test_merge_equals_build_on_union(spark):
    a, b = _keys(spark, 0, 300), _keys(spark, 200, 600)
    merged = bloom_merge(
        bloom_build(a, "k", M, K, SEED), bloom_build(b, "k", M, K, SEED)
    )
    scratch = bloom_build(a.unionByName(b), "k", M, K, SEED)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, scratch.collect()))


def test_word_table_is_bounded_and_null_keys_skip(spark):
    df = spark.range(5000).selectExpr(
        "CASE WHEN id % 10 = 0 THEN NULL ELSE CONCAT('k', id) END AS k"
    )
    bl = bloom_build(df, "k", M, K, SEED)
    assert bl.count() <= M // 32
    probed = bloom_probe(
        spark.sql("SELECT 1 AS id, CAST(NULL AS STRING) AS k"), "k", bl, "id", M, K, SEED
    )
    (row,) = probed.collect()
    assert row.maybe_member is False


def test_probe_plan_broadcasts_the_filter(spark):
    bl = bloom_build(_keys(spark, 0, 100), "k", M, K, SEED)
    probed = bloom_probe(
        _keys(spark, 0, 200).withColumn("id", F.expr("monotonically_increasing_id()")),
        "k", bl, "id", M, K, SEED,
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_admits_equal_plain_incremental_dedup(spark):
    docs = spark.range(400).selectExpr(
        "id AS doc_id",
        # 100 distinct texts -> plenty of batch-internal and
        # batch-vs-index duplicates
        "CONCAT('text body number ', id % 100) AS text",
    )
    corpus = docs.where("doc_id < 250")
    idx = corpus.select(F.md5("text").alias("content_hash")).distinct()
    batch = docs.where("doc_id >= 250")
    bl = bloom_build(idx, "content_hash", M, K, SEED)
    got = bloom_prefilter_admits(batch, "text", "doc_id", bl, idx, M, K, SEED)
    want = incremental_dedup(batch, "text", "doc_id", idx)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_m_bits_must_pack(spark):
    import pytest

    with pytest.raises(ValueError):
        bloom_build(_keys(spark, 0, 10), "k", m_bits=100, k=2, seed=SEED)
