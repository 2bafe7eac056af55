"""Batch-superstep BPE training (r7 verdict ask #3): `batch_k>1` must
(a) cut the number of driver supersteps to ~merges/K, and (b) keep the
merge table equal to sequential greedy whenever the batched pairs are
independent — with the symbol-disjoint prefix rule falling back to
singles on adversarial overlapping histograms instead of diverging.
"""

import pyspark.sql.functions as F  # noqa: F401


def _train(spark, texts, n_merges, batch_k):
    from easydb_server_spark.operators.text import bpe_merges

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    stats: dict = {}
    rows = (
        bpe_merges(df, "text", n_merges=n_merges, batch_k=batch_k, stats=stats)
        .orderBy("rank")
        .collect()
    )
    return [(r.rank, r.left, r.right, r.merged, r.pair_count) for r in rows], stats


def test_batched_equals_sequential_on_independent_pairs(spark):
    """Crafted corpus whose top pairs are symbol-disjoint with distinct
    counts — the exactness precondition provably holds, so batch_k=4
    must reproduce sequential greedy merge-for-merge."""
    texts = (
        ["ab"] * 16  # (a,b): 16
        + ["cd"] * 12  # (c,d): 12
        + ["ef"] * 9  # (e,f): 9
        + ["gh"] * 7  # (g,h): 7
        + ["ij"] * 5
        + ["kl"] * 3
    )
    seq, seq_stats = _train(spark, texts, n_merges=6, batch_k=1)
    bat, bat_stats = _train(spark, texts, n_merges=6, batch_k=4)
    assert bat == seq
    assert seq_stats["supersteps"] == 6
    # 6 merges at K=4: superstep 1 takes 4, superstep 2 the rest
    assert bat_stats["supersteps"] <= 3


def test_batched_prefix_stops_at_overlapping_pair(spark):
    """Adversarial histogram where pair 2 shares a symbol with pair 1
    ((a,b) then (b,c) — merging ab changes (b,c)'s count): the prefix
    rule must accept only pair 1 that superstep, and the final merge
    table must still equal sequential greedy."""
    texts = ["abc"] * 10 + ["ab"] * 5 + ["bc"] * 3
    seq, _ = _train(spark, texts, n_merges=3, batch_k=1)
    bat, _ = _train(spark, texts, n_merges=3, batch_k=4)
    assert bat == seq


def test_batched_merged_token_collision_falls_back(spark):
    """If a later top pair's symbol EQUALS an earlier pair's merged
    token (pair (a,b) then pair (ab,x) where 'ab' is also a standalone
    symbol), batching must stop before it — the merge changes that
    pair's count."""
    # "a b" chars inside words: word 'ab' -> syms [a,b]; word 'zab…'
    # none: craft with single chars only. 'q' 'r' merged token 'qr'
    # collides with pre-existing symbol pair (qr is not a single char,
    # so build words containing the two-char symbol via a prior merge).
    texts = ["qr"] * 10 + ["qrs"] * 6  # (q,r)=16 then (qr,s)=6 after merge
    seq, _ = _train(spark, texts, n_merges=2, batch_k=4)
    bat, _ = _train(spark, texts, n_merges=2, batch_k=4)
    assert seq == bat
    assert [m[3] for m in seq] == ["qr", "qrs"]


def test_superstep_count_scales_inversely_with_k(spark):
    """jobs ∝ merges/K on a wide independent histogram."""
    import string

    pairs = list(zip(string.ascii_lowercase[:16:2], string.ascii_lowercase[1:16:2]))
    texts = []
    for i, (a, b) in enumerate(pairs):
        texts += [a + b] * (100 - 10 * i)  # distinct descending counts
    _, s1 = _train(spark, texts, n_merges=8, batch_k=1)
    _, s4 = _train(spark, texts, n_merges=8, batch_k=4)
    _, s8 = _train(spark, texts, n_merges=8, batch_k=8)
    assert s1["supersteps"] == 8
    assert s4["supersteps"] <= 3
    assert s8["supersteps"] <= 2


def test_default_path_unchanged_for_conformance(spark):
    """batch_k defaults to 1 — the oracle-matched exact-greedy path."""
    import inspect

    from easydb_server_spark.operators.text import bpe_merges

    assert inspect.signature(bpe_merges).parameters["batch_k"].default == 1


def test_driver_path_matches_spark_fallback(spark, monkeypatch):
    """r16: histograms at or below BPE_DRIVER_MAX_WORDS train on the
    driver. Forcing the bound to 0 must route the same corpus through
    the Spark superstep loop and produce an identical merge table —
    including on a tie-heavy, overlapping corpus with batch_k > 1."""
    import easydb_server_spark.operators.text as T

    texts = (
        ["abc"] * 10 + ["ab"] * 5 + ["bc"] * 5  # (b,c) ties (a,b) post-merge
        + ["xyx"] * 7 + ["aaaa"] * 3            # overlap runs
    )
    driver, d_stats = _train(spark, texts, n_merges=5, batch_k=2)
    monkeypatch.setattr(T, "BPE_DRIVER_MAX_WORDS", 0)
    fallback, f_stats = _train(spark, texts, n_merges=5, batch_k=2)
    assert driver == fallback
    assert d_stats["supersteps"] == f_stats["supersteps"]
