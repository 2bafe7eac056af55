"""Unigram-LM (SentencePiece-style) tokenizer: train + Viterbi apply.

The second tokenizer family next to BPE (``operators/text.py``
``bpe_merges``/``bpe_apply``): Kudo 2018 ("Subword Regularization",
the algorithm behind SentencePiece's default model) scores a vocabulary
of sub-word pieces with unigram log-probabilities and segments text by
the maximum-likelihood piece sequence. Training here is the hard-EM
(Viterbi-EM) variant: alternate "segment the corpus under the current
scores" with "re-estimate scores from the piece counts", pruning the
vocabulary toward the target size — the documented simplification of
Kudo's full forward-backward EM that keeps every step a DataFrame
aggregation (the lattice expectations of full EM need per-position
posteriors that have no shuffle-free columnar form).

Everything is exact-integer once inside the DP: scores are
``round(ln(count/total) * 1e6)`` BIGINTs, so the Viterbi fold compares
longs, never floats — the same determinism discipline as BM25/DSIR —
and an independent engine (the DuckDB oracle) replays segmentation
bit-for-bit.

Scale shape (the bpe_apply discipline, reference src/main.rs:1 is a
gateway with no tokenizer at all — this is superset surface):

- the corpus collapses to its DISTINCT-WORD histogram before any
  per-word work: segmentation cost is vocabulary-bounded, not
  corpus-bounded, at 100 TB exactly like ``bpe_apply``;
- the Viterbi DP is a JVM higher-order ``aggregate`` fold over word
  positions — zero Python, zero shuffle, rides the word histogram;
- the piece vocabulary travels as a one-row ``map_from_entries``
  aggregate broadcast onto the fold (never a driver collect inside the
  training loop, never a per-entry literal expression chain);
- each training iteration is two linear shuffles (piece counts,
  prune top-k) over piece-width rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Integer score scale: ln(p) * 1e6 rounded — 6 decimal digits of
# log-prob, exact in BIGINT arithmetic.
SCALE = 1_000_000
# Unknown single character: ln(p) = -20 (p ~ 2e-9). Keeps the fold
# total on any input while scoring real pieces far above it.
UNK_SCORE = -20 * SCALE
# Packed-score trick: the DP maximizes s'(piece) = s(piece)*PACK - 1,
# i.e. lexicographically (total score, FEWER pieces). This makes the
# tie-break a property of the VALUE, not of argmax evaluation order —
# any two engines agree on (score, n_pieces) even when multiple
# segmentations tie, which is what lets the DuckDB oracle replay the
# DP with two scalar folds and no argmax at all (DuckDB 1.0's
# list_reduce mis-evaluates multi-field struct accumulators whose
# fields cross-reference, so the oracle must not carry paths).
# Bounds: |score| <= 24 chars * |UNK| = 4.8e8; * PACK = 5.04e14,
# comfortably inside BIGINT.
PACK = 1 << 20
# Impossible-path sentinel: far below any reachable packed path sum
# (-5.04e14), far above BIGINT overflow even after one more add.
SENTINEL = -(10**17)


def normalize_text(text_col) -> F.Column:
    """Shared normalization both engines replay bit-for-bit: lower,
    keep printable ASCII only (multibyte lowercasing differs across
    engines — e.g. dotted-I — so the exact-oracle contract drops
    non-ASCII), collapse whitespace runs, trim."""
    t = F.lower(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
    t = F.regexp_replace(t, "[^ -~]", "")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def _cand(acc, i, l: int, vmap):
    """Candidate PACKED score for a piece of length ``l`` ending at
    1-based position ``i``: best(i-l) + s(piece)*PACK - 1. Unknown
    pieces score UNK when single-char (totality), SENTINEL
    otherwise."""
    piece = F.col("word").substr((i - F.lit(l) + 1).cast("int"), F.lit(l))
    packed = F.element_at(vmap, piece) * F.lit(PACK) - F.lit(1)
    fallback = F.lit(UNK_SCORE * PACK - 1) if l == 1 else F.lit(SENTINEL)
    s = F.coalesce(packed, fallback)
    return F.when(i >= l, F.element_at(acc["w"], l) + s).otherwise(F.lit(SENTINEL))


def _viterbi_step(vmap, max_len: int):
    """(acc, i) fold step (closure factory — never default-arg
    lambdas, HOF arity pitfall). State: ``w``[k] = best packed score
    at position i-k, ``p``[k] = that position's best path, ``n``[k]
    its piece count; each step prepends position i's best and drops
    the oldest. ``array_position`` takes the FIRST max, i.e. the
    shortest piece at each step — which packed argmax guarantees has
    the engine-independent (score, n_pieces)."""

    def _step(acc, i):
        cands = F.array(*[_cand(acc, i, l, vmap) for l in range(1, max_len + 1)])
        best = F.array_max(cands)
        idx = F.array_position(cands, best).cast("int")
        piece = F.col("word").substr((i - idx + 1).cast("int"), idx)
        path = F.concat(F.element_at(acc["p"], idx), F.lit("|"), piece)
        cnt = F.element_at(acc["n"], idx) + F.lit(1)
        return F.struct(
            F.slice(F.concat(F.array(best), acc["w"]), 1, max_len).alias("w"),
            F.slice(F.concat(F.array(path), acc["p"]), 1, max_len).alias("p"),
            F.slice(F.concat(F.array(cnt), acc["n"]), 1, max_len).alias("n"),
        )

    return _step


def _state_finish(acc):
    """Unary finish: (packed best, best path, piece count) at the
    final position; the true score unpacks as (packed + n) / PACK."""
    return F.struct(
        F.element_at(acc["w"], 1).alias("packed"),
        F.regexp_replace(F.element_at(acc["p"], 1), r"^\|", "").alias("toks"),
        F.element_at(acc["n"], 1).alias("n"),
    )


def viterbi_segment(words: DataFrame, vmap_col, max_piece_len: int = 4) -> DataFrame:
    """Maximum-likelihood segmentation of a ``word`` column under a
    piece-score map column ``vmap_col`` (map<string,bigint>, scaled
    log-probs). Adds ``toks`` (pieces joined by ``|``), ``n_pieces``,
    and ``score`` (exact BIGINT path sum; equal-score ties resolve to
    the fewest-piece segmentation via packed scoring). Pure JVM fold —
    zero Python, zero shuffle; cost is linear in total word chars."""
    init = F.struct(
        F.array(F.lit(0).cast("bigint"), *[F.lit(SENTINEL)] * (max_piece_len - 1)).alias("w"),
        F.array(*[F.lit("")] * max_piece_len).alias("p"),
        F.array(F.lit(0).cast("bigint"), *[F.lit(0).cast("bigint")] * (max_piece_len - 1)).alias(
            "n"
        ),
    )
    fold = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        init,
        _viterbi_step(vmap_col, max_piece_len),
        _state_finish,
    )
    out = words.withColumn("_st", fold)
    return out.select(
        *words.columns,
        F.col("_st.toks").alias("toks"),
        F.col("_st.n").cast("int").alias("n_pieces"),
        ((F.col("_st.packed") + F.col("_st.n")) / F.lit(PACK)).cast("bigint").alias("score"),
    )


def _word_histogram(df: DataFrame, text_col: str, max_word_len: int) -> DataFrame:
    """(word, wc): normalized whitespace words, truncated to
    ``max_word_len`` chars (bounds the fold depth; real-token tails
    beyond 24 chars are URL/hash junk), weighted by occurrence."""
    w = F.explode(F.split(normalize_text(text_col), " ")).alias("word")
    return (
        df.select(w)
        .where(F.col("word") != "")
        .select(F.substring("word", 1, max_word_len).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _vmap_row(vocab: DataFrame):
    """One-row map<piece,score> aggregate of a (piece, score) frame —
    broadcast onto the fold, so the vocabulary never passes through
    the driver and never compiles per-entry expression chains."""
    return F.broadcast(
        vocab.agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("piece"), F.col("score").cast("bigint")))
            ).alias("_vmap")
        )
    )


def _scored(counts: DataFrame) -> DataFrame:
    """(piece, cnt) -> (piece, score, cnt) with score =
    round(ln(cnt/total) * SCALE) as BIGINT (total over a one-row
    broadcast aggregate, no window)."""
    total = counts.agg(F.sum("cnt").alias("_tot"))
    return counts.crossJoin(F.broadcast(total)).select(
        "piece",
        F.round(F.log(F.col("cnt") / F.col("_tot")) * SCALE).cast("bigint").alias("score"),
        "cnt",
    )


def unigram_train(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 256,
    max_piece_len: int = 4,
    iterations: int = 2,
    seed_size: int = 2000,
    max_word_len: int = 24,
) -> DataFrame:
    """Train a unigram-LM piece vocabulary by Viterbi-EM with pruning
    (Kudo 2018 §3.2, hard-EM variant). Returns (piece, score, cnt)
    sorted by cnt desc — ``score`` is the scaled log-prob the apply
    path consumes.

    Seed: the ``seed_size`` most frequent word substrings of length
    1..``max_piece_len`` (weighted by word count) plus EVERY single
    character seen (coverage: totality of segmentation). Iterate:
    segment the distinct-word histogram under current scores (JVM
    fold), count pieces weighted by word count, re-score, prune to
    ``vocab_size`` by (count desc, piece asc) — single characters are
    never pruned. Determinism: every tie-break is lexicographic; no
    randomness anywhere.

    Scale shape: per-iteration cost is one fold over the word
    histogram plus two linear piece-width shuffles; the vocabulary
    moves as a one-row broadcast map. Nothing is collected to the
    driver at any point — the returned frame is lazily computable on
    a cluster of any size.
    """
    words = _word_histogram(df, text_col, max_word_len)

    # seed: all substrings up to max_piece_len, weighted by word count
    subs = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                _substrings_at(max_piece_len),
            )
        )
    ).alias("piece")
    pieces = words.select(subs, "wc").where(F.col("piece") != "")
    counts = pieces.groupBy("piece").agg(F.sum("wc").alias("cnt"))
    singles = counts.where(F.length("piece") == 1)
    multis = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(max(seed_size - vocab_size // 4, vocab_size))
    )
    vocab = _scored(singles.unionByName(multis))

    for _ in range(iterations):
        seg = viterbi_segment(
            words.crossJoin(_vmap_row(vocab)), F.col("_vmap"), max_piece_len
        )
        counts = (
            seg.select(F.explode(F.split("toks", r"\|")).alias("piece"), "wc")
            .groupBy("piece")
            .agg(F.sum("wc").alias("cnt"))
        )
        singles = counts.where(F.length("piece") == 1)
        # prune multi-char pieces to (vocab_size - #singles) by count;
        # the rank window is over piece-count rows (vocab-bounded, a
        # deliberate single-partition sort of <= seed_size rows)
        from pyspark.sql import Window

        rk = F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("piece")))
        multis = (
            counts.where(F.length("piece") > 1)
            .crossJoin(F.broadcast(singles.agg(F.count(F.lit(1)).alias("_ns"))))
            .withColumn("_rk", rk)
            .where(F.col("_rk") <= F.lit(vocab_size) - F.col("_ns"))
            .select("piece", "cnt")
        )
        vocab = _scored(singles.unionByName(multis))

    return vocab.orderBy(F.col("cnt").desc(), "piece")


def _substrings_at(max_piece_len: int):
    """Closure factory: position i -> all substrings of ``word``
    starting at i with length 1..max_piece_len (HOF-arity note)."""

    def _f(i):
        return F.transform(
            F.sequence(F.lit(1), F.lit(max_piece_len)),
            _substr_from(i),
        )

    return _f


def _substr_from(i):
    def _g(l):
        return F.col("word").substr(i.cast("int"), l.cast("int"))

    return _g


def unigram_apply(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: DataFrame | dict[str, int],
    max_piece_len: int = 4,
    max_word_len: int = 24,
) -> DataFrame:
    """Tokenize a corpus under a trained unigram vocabulary: per doc
    (doc_id, n_words, n_chars, n_tokens, score) where n_tokens is the
    Viterbi-optimal piece count and ``score`` the exact BIGINT path
    sum over the document's words — the pre-training tokenize step
    whose output feeds chunking/packing, and the cross-engine-exact
    counterpart of ``bpe_apply``.

    ``vocab`` is a (piece, score) DataFrame (runtime one-row broadcast
    map; the 100 TB path) or a literal dict (compiled map literal —
    right for frozen few-dozen-piece conformance vocabularies).

    Scale shape: segmentation folds once per DISTINCT word (the
    bpe_apply collapse — vocab-bounded, not corpus-bounded), documents
    re-join the encoded words broadcast-style and aggregate counts:
    one explode + one broadcast join + one groupBy regardless of
    corpus size.
    """
    words = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(normalize_text(text_col), " ")).alias("word"),
        )
        .where(F.col("word") != "")
        .select("doc_id", F.substring("word", 1, max_word_len).alias("word"))
    )
    distinct = words.select("word").distinct()
    if isinstance(vocab, DataFrame):
        base = distinct.crossJoin(_vmap_row(vocab))
        vmap = F.col("_vmap")
    else:
        items = sorted(vocab.items())
        vmap = F.map_from_arrays(
            F.array(*[F.lit(k) for k, _ in items]),
            F.array(*[F.lit(int(v)).cast("bigint") for _, v in items]),
        )
        base = distinct
    seg = viterbi_segment(base, vmap, max_piece_len).select("word", "n_pieces", "score")
    return (
        words.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_pieces").alias("n_tokens"),
            F.sum("score").alias("score"),
        )
    )
