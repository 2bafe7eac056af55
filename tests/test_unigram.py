"""Unigram-LM tokenizer (operators/unigram.py): Viterbi fold vs an
independent Python DP (hypothesis-fuzzed), packed-score tie
semantics, hard-EM training properties, and apply aggregation."""

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from easydb_server_spark.operators.unigram import (
    PACK,
    UNK_SCORE,
    unigram_apply,
    unigram_train,
    viterbi_segment,
)


def ref_viterbi(word: str, vocab: dict[str, int], max_len: int = 4):
    """Reference DP over packed scores s*PACK - 1: returns
    (score, n_pieces) with the fewest-pieces tie-break — the
    engine-independent value contract both Spark and the DuckDB
    oracle must reproduce."""
    n = len(word)
    best = [None] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        for l in range(1, min(max_len, i) + 1):
            piece = word[i - l : i]
            s = vocab.get(piece)
            if s is None:
                if l != 1:
                    continue
                s_packed = UNK_SCORE * PACK - 1
            else:
                s_packed = s * PACK - 1
            cand = best[i - l] + s_packed
            if best[i] is None or cand > best[i]:
                best[i] = cand
    packed = best[n]
    score = -((-packed) // PACK)  # ceil for negatives: S in packed = PACK*S - N
    return score, PACK * score - packed


def _vmap(vocab):
    items = sorted(vocab.items())
    return F.map_from_arrays(
        F.array(*[F.lit(k) for k, _ in items]),
        F.array(*[F.lit(int(v)).cast("bigint") for _, v in items]),
    )


def _segment(spark, words, vocab):
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    rows = viterbi_segment(df, _vmap(vocab)).collect()
    return {r.word: (r.score, r.n_pieces, r.toks) for r in rows}


def test_viterbi_hand_cases(spark):
    got = _segment(
        spark, ["abcabx", "aab"], {"ab": -10, "c": -30, "a": -25, "b": -28}
    )
    # ab|c|ab|x: -10 - 30 - 10 + UNK('x')
    assert got["abcabx"] == (UNK_SCORE - 50, 4, "ab|c|ab|x")
    assert got["aab"] == (-35, 2, "a|ab")


def test_viterbi_tie_prefers_fewer_pieces(spark):
    # 'ab' piece ties a|b exactly (-10 each way): packed scoring must
    # pick the single piece on BOTH engines
    got = _segment(spark, ["ab"], {"ab": -10, "a": -4, "b": -6})
    assert got["ab"] == (-10, 1, "ab")


def test_viterbi_unknown_chars_total(spark):
    got = _segment(spark, ["zzz"], {"ab": -10})
    assert got["zzz"] == (3 * UNK_SCORE, 3, "z|z|z")


@st.composite
def _word_and_vocab(draw):
    alpha = "abcd"
    word = draw(st.text(alphabet=alpha, min_size=1, max_size=12))
    pieces = draw(
        st.sets(
            st.text(alphabet=alpha, min_size=1, max_size=4), min_size=1, max_size=8
        )
    )
    vocab = {
        p: draw(st.integers(min_value=-5_000_000, max_value=-1)) for p in pieces
    }
    return word, vocab


@settings(max_examples=25, deadline=None)
@given(_word_and_vocab())
def test_viterbi_matches_reference_dp(spark, wv):
    word, vocab = wv
    got = _segment(spark, [word], vocab)[word]
    want = ref_viterbi(word, vocab)
    assert (got[0], got[1]) == want
    # the reported pieces really are a segmentation of the word with
    # the reported count (toks may contain '|' only as separator here
    # because the alphabet excludes it)
    assert got[2].replace("|", "") == word
    assert len(got[2].split("|")) == got[1]


def test_train_learns_repeated_subwords(spark):
    docs = spark.createDataFrame(
        [(i, "internationalization is internationalization") for i in range(4)]
        + [(i + 10, "the cat sat on the mat " * 3) for i in range(4)],
        ["doc_id", "text"],
    )
    v = unigram_train(docs, "text", vocab_size=40, iterations=2, seed_size=200)
    rows = v.collect()
    assert 0 < len(rows) <= 40
    pieces = {r.piece for r in rows}
    # whole short words survive as single pieces; the 20-char word
    # segments into learned 4-char pieces
    assert "the" in pieces and "cat" in pieces
    assert {"inte", "rnat", "iona", "liza", "tion"} <= pieces
    # scores are scaled ln-probs: negative, and ordered by count
    assert all(r.score < 0 for r in rows)
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_train_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta") for i in range(3)], ["doc_id", "text"]
    )
    a = unigram_train(docs, "text", vocab_size=30, iterations=1, seed_size=100).collect()
    b = unigram_train(docs, "text", vocab_size=30, iterations=1, seed_size=100).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_apply_aggregates_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa"), (3, None), (4, "éé")], ["doc_id", "text"]
    )
    out = unigram_apply(docs, "text", "doc_id", {"aa": -10, "bb": -20}).orderBy(
        "doc_id"
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_words == 2 and rows[1].n_tokens == 2 and rows[1].score == -30
    assert rows[2].n_words == 1 and rows[2].score == -10
    # null text and non-ASCII-only text produce no words -> no row
    assert 3 not in rows and 4 not in rows


def test_apply_accepts_vocab_dataframe(spark):
    docs = spark.createDataFrame([(1, "aa aa")], ["doc_id", "text"])
    vocab = spark.createDataFrame([("aa", -10)], ["piece", "score"])
    (row,) = unigram_apply(docs, "text", "doc_id", vocab).collect()
    assert (row.n_words, row.n_tokens, row.score) == (2, 2, -20)


def test_apply_truncates_long_words(spark):
    docs = spark.createDataFrame([(1, "x" * 60)], ["doc_id", "text"])
    (row,) = unigram_apply(docs, "text", "doc_id", {"x": -5}).collect()
    assert row.n_chars == 24 and row.n_tokens == 24 and row.score == -120


def test_trained_vocab_feeds_apply_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, "segmentation segmentation units") for i in range(3)],
        ["doc_id", "text"],
    )
    v = unigram_train(docs, "text", vocab_size=30, iterations=1, seed_size=100)
    out = unigram_apply(docs, "text", "doc_id", v)
    rows = out.collect()
    assert len(rows) == 3
    # trained pieces segment their own corpus far above all-UNK cost
    assert all(r.score > 3 * UNK_SCORE for r in rows)
