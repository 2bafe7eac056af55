"""Text-analysis and corpus-curation operators for training-data
pipelines.

Scoring / filtering: :func:`language_id`, :func:`quality_score`,
:func:`quality_prune` (exact + approx-quantile), :func:`token_counts`,
:func:`repetition_metrics`, :func:`unigram_logprob` +
:func:`ccnet_buckets` (CCNet-style LM quality stack),
:func:`tfidf_keywords`.

Sampling / mixing / splitting: :func:`weighted_mixture`,
:func:`hash_split`, :func:`stratified_sample`, :func:`corpus_shuffle`,
:func:`source_cap` (domain balancing, exact + sortless threshold).

Training-unit prep: :func:`chunk_documents`, :func:`pack_sequences`,
:func:`decontaminate`, :func:`normalize_text`, :func:`redact_pii`,
:func:`fingerprint`, :func:`vocabulary`, :func:`ngram_topk`,
:func:`length_histogram`.

All pure JVM column expressions (no UDFs) — whole-stage codegen over
the documents scan, trivially parallel at 100 TB; the only shuffles
are keyed aggregates/windows documented per function.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from easydb_server_spark.functions.exactround import round_ratio, scaled_round_half
from easydb_server_spark.operators._localframe import local_frame

# tiny deterministic stopword profiles per language (shared with oracles)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "is"],
    "de": ["der", "und", "die", "das", "ist", "ein"],
    "es": ["el", "la", "de", "que", "y", "es"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "zh": ["的", "是", "了", "在", "和", "有"],
}

BPE_ISH_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _words(text_col):
    return F.split(text_col, " ")


def _profile_hits(words, profile: list[str]):
    arr = F.array(*[F.lit(w) for w in profile])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Predict language by max stopword-profile hit count (ties break
    by language code order — deterministic)."""
    words = _words(F.col(text_col))
    langs = sorted(LANG_PROFILES)
    hits = [(_profile_hits(words, LANG_PROFILES[lg])).alias(f"hits_{lg}") for lg in langs]
    scored = df.select(F.col(id_col).alias("doc_id"), *hits)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):  # earlier langs win ties → apply in reverse
        pred = F.when(F.col(f"hits_{lg}") == best, lg).otherwise(pred)
    return scored.withColumn("pred_lang", F.when(best > 0, pred).otherwise("unknown")).select(
        "doc_id", "pred_lang", *[f"hits_{lg}" for lg in langs]
    )


def _quality_counts(t) -> dict[str, F.Column]:
    """The four exact counts the quality score is a function of.
    MATERIALIZE these into columns before scoring — the regexp and
    stopword-filter expressions are the expensive part, and the
    integer rounding references its numerator several times."""
    words = _words(t)
    return {
        "n_chars": F.length(t),
        "n_words": F.size(words),
        "n_punct": F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", "")),
        "n_stopwords": _profile_hits(words, LANG_PROFILES["en"]),
    }


def _quality_from_counts(n_chars, n_words, n_punct, en_stop) -> F.Column:
    """score = nw/400 + 2*stop/GW - 5*punct/GC as ONE exact rational,
    rounded half-away in INT64 (functions/exactround) — the
    float-composite ROUND(double, 6) form tie-breaks exact 6-decimal
    midpoints differently across engines. Scaling the numerator by
    10^6 would overflow INT64 (num <= nw*GW*GC ~ 4e13), so the
    fraction pre-reduces: score*10^6 = num*2500/(GW*GC). Inputs must
    be cheap column references (see :func:`_quality_counts`)."""
    gw = F.greatest(n_words, F.lit(1)).cast("bigint")
    gc = F.greatest(n_chars, F.lit(1)).cast("bigint")
    num = (
        n_words.cast("bigint") * gw * gc
        + F.lit(800).cast("bigint") * en_stop.cast("bigint") * gc
        - F.lit(2000).cast("bigint") * n_punct.cast("bigint") * gw
    )
    q = scaled_round_half(F.abs(num) * F.lit(2500).cast("bigint"), gw * gc)
    sgn = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
    return (sgn * q).cast("double") / F.lit(1000000.0)


def with_quality(df: DataFrame, text_col: str, out_col: str = "quality") -> DataFrame:
    """Append the composite quality score via a THREE-STEP projection:
    the counts materialize first (regexp/stopword work runs once per
    row), then the reduced integer numerator/denominator materialize
    (the rounding chain references its operands ~50x — over two
    column SLOTS that is ~100 cheap ops and small generated code;
    over inline expressions it was a measured 1.8x), then the score.
    Keeps all existing columns; this is the form every consumer
    (rankers, the score query itself) should use — WHERE gates use
    :func:`quality_gate` instead."""
    staged = df.select(
        "*", *[c.alias(f"_q_{n}") for n, c in _quality_counts(F.col(text_col)).items()]
    )
    gw = F.greatest(F.col("_q_n_words"), F.lit(1)).cast("bigint")
    gc = F.greatest(F.col("_q_n_chars"), F.lit(1)).cast("bigint")
    num = (
        F.col("_q_n_words").cast("bigint") * gw * gc
        + F.lit(800).cast("bigint") * F.col("_q_n_stopwords").cast("bigint") * gc
        - F.lit(2000).cast("bigint") * F.col("_q_n_punct").cast("bigint") * gw
    )
    reduced = staged.select("*", num.alias("_q_num"), (gw * gc).alias("_q_den"))
    q = scaled_round_half(
        F.abs(F.col("_q_num")) * F.lit(2500).cast("bigint"), F.col("_q_den")
    )
    sgn = F.when(F.col("_q_num") < 0, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
    scored = reduced.withColumn(
        out_col, (sgn * q).cast("double") / F.lit(1000000.0)
    )
    return scored.drop(
        "_q_n_chars", "_q_n_words", "_q_n_punct", "_q_n_stopwords", "_q_num", "_q_den"
    )


def quality_gate(df: DataFrame, text_col: str, threshold: float = 0.2) -> DataFrame:
    """Filter to rows whose composite quality score (rounded at 6 dp)
    is >= ``threshold`` — WITHOUT materializing the score. The gate is
    the pure integer predicate round(num*2500/(GW*GC)) >= T  <=>
    2*2500*num >= (2*T*10^6 - 1)*GW*GC, referencing each count ONCE,
    so Catalyst's filter pushdown inlines the four count expressions
    once per row (gating on a computed rounded column re-inlined the
    whole rounding chain — a measured 2.5x on the curation pipeline).
    Selects the same rows as ``with_quality(...).where(q >= T)``."""
    t6 = round(threshold * 10**6)
    if abs(t6 - threshold * 10**6) > 1e-6:
        raise ValueError(f"threshold {threshold} is not on the 1e-6 grid")
    c = _quality_counts(F.col(text_col))
    gw = F.greatest(c["n_words"], F.lit(1)).cast("bigint")
    gc = F.greatest(c["n_chars"], F.lit(1)).cast("bigint")
    num = (
        c["n_words"].cast("bigint") * gw * gc
        + F.lit(800).cast("bigint") * c["n_stopwords"].cast("bigint") * gc
        - F.lit(2000).cast("bigint") * c["n_punct"].cast("bigint") * gw
    )
    return df.where(
        F.lit(5000).cast("bigint") * num
        >= F.lit(2 * t6 - 1).cast("bigint") * gw * gc
    )


def _quality_col(t) -> F.Column:
    """The composite score as ONE inline column expression — kept for
    expression-level composition, but it re-derives the counts inside
    the rounding chain (several x per row); prefer
    :func:`with_quality` anywhere the input is a DataFrame."""
    c = _quality_counts(t)
    return _quality_from_counts(
        c["n_chars"], c["n_words"], c["n_punct"], c["n_stopwords"]
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality metrics: counts are exact ints; the composite
    score is a fixed linear formula rounded for portability. Two-step
    projection: counts materialize, then the score reads them."""
    counts = _quality_counts(F.col(text_col))
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        counts["n_chars"].alias("n_chars"),
        counts["n_words"].alias("n_words"),
        counts["n_punct"].alias("n_punct"),
        counts["n_stopwords"].alias("n_stopwords"),
    )
    gw = F.greatest(F.col("n_words"), F.lit(1)).cast("bigint")
    gc = F.greatest(F.col("n_chars"), F.lit(1)).cast("bigint")
    num = (
        F.col("n_words").cast("bigint") * gw * gc
        + F.lit(800).cast("bigint") * F.col("n_stopwords").cast("bigint") * gc
        - F.lit(2000).cast("bigint") * F.col("n_punct").cast("bigint") * gw
    )
    reduced = staged.select("*", num.alias("_q_num"), (gw * gc).alias("_q_den"))
    q = scaled_round_half(
        F.abs(F.col("_q_num")) * F.lit(2500).cast("bigint"), F.col("_q_den")
    )
    sgn = F.when(F.col("_q_num") < 0, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
    return reduced.select(
        "doc_id",
        "n_chars",
        "n_words",
        "n_punct",
        "n_stopwords",
        ((sgn * q).cast("double") / F.lit(1000000.0)).alias("quality"),
    )


def quality_prune(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    keep_frac: float = 0.5,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Quality-based corpus pruning: rank docs by the composite quality
    score within each group (language/domain) and keep the top
    ``keep_frac`` — the standard "prune the worst X% per language"
    curation step before pre-training.

    ``exact=True`` (the oracle-able reference semantics): row_number
    over (quality DESC, doc_id) with a per-group count, kept ⇔ rank ≤
    ceil(frac·n). One shuffle on the group key; both windows share it.

    ``exact=False`` (the 100 TB path): with only a handful of huge
    groups (few languages over a whole corpus) the per-group sort is
    the bottleneck, so instead compute one approx-quantile threshold
    per group (``percentile_approx`` — a partial-aggregable sketch, no
    global sort), broadcast the tiny (grp, threshold) frame back, and
    keep ⇔ quality ≥ threshold. The keep set matches exact within the
    sketch's rank error (≤ 1/``accuracy``) plus threshold ties; no
    rank/count columns because nothing is ever totally ordered.
    """
    from pyspark.sql import Window

    base = with_quality(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(group_col).alias("grp"),
            F.col(text_col).alias("_qtext"),
        ),
        "_qtext",
    ).drop("_qtext")
    if not exact:
        thr = base.groupBy("grp").agg(
            F.percentile_approx("quality", 1.0 - keep_frac, accuracy).alias("q_thr")
        )
        return base.join(F.broadcast(thr), "grp").withColumn(
            "kept", F.col("quality") >= F.col("q_thr")
        )
    w = Window.partitionBy("grp").orderBy(F.col("quality").desc(), F.col("doc_id"))
    wg = Window.partitionBy("grp")
    return (
        base.withColumn("rank_in_grp", F.row_number().over(w))
        .withColumn("n_grp", F.count(F.lit(1)).over(wg))
        .withColumn(
            "kept", F.col("rank_in_grp") <= F.ceil(F.lit(keep_frac) * F.col("n_grp"))
        )
    )


def _order_hash(id_col: str, seed: str) -> F.Column:
    """The deterministic 60-bit training-order hash of (seed, id) —
    the ONE definition of shard membership, shared by
    :func:`corpus_shuffle`, :func:`shard_manifest`, and the streaming
    exporter so batch and streaming shards can never disagree."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def _text_hash32(text_col: str) -> F.Column:
    """32-bit per-doc content hash for the abelian manifest digest."""
    return F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("bigint")


def corpus_shuffle(df: DataFrame, id_col: str, n_shards: int = 8, seed: str = "v1") -> DataFrame:
    """Deterministic global shuffle + sharding for training order.

    Training pipelines need a reproducible random order that is stable
    across runs, engines, cluster sizes, and input file order — so the
    order is a pure function of (seed, id): h = 60-bit md5(seed:id),
    shard = h mod n_shards, pos = rank of h within the shard. Writing
    shard s in pos order yields the shuffled corpus; changing the seed
    reshuffles everything, changing nothing else reshuffles nothing.

    One shuffle on the shard key; the per-shard sort is bounded by
    |corpus| / n_shards, and n_shards is large (thousands) in a real
    export, so no single sort is corpus-sized.
    """
    from pyspark.sql import Window

    h = _order_hash(id_col, seed)
    base = df.select(F.col(id_col).alias("doc_id"), h.alias("h")).withColumn(
        "shard", (F.col("h") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("h"), F.col("doc_id"))
    return base.withColumn("pos", F.row_number().over(w)).select("doc_id", "shard", "pos")


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens +
    distinct-token ratio (type/token)."""
    t = F.col(text_col)
    ws = F.split(t, " +")
    bpe = F.regexp_extract_all(t, F.lit(BPE_ISH_TOKEN_RE), 0)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).alias("ws_tokens"),
        F.size(bpe).alias("bpe_tokens"),
        F.size(F.array_distinct(ws)).alias("distinct_tokens"),
    ).withColumn(
        "type_token_ratio",
        round_ratio(F.col("distinct_tokens"), F.col("ws_tokens"), 6),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Document fingerprint: minimum rolling-window shingle hash —
    robust to reordering at the edges, cheap equality pre-filter for
    dedup pipelines."""
    from easydb_server_spark.operators.dedup import _shingle_hash, word_shingles

    sh = word_shingles(df, text_col, id_col, k).withColumn("h0", _shingle_hash(F.col("shingle")))
    return sh.groupBy("doc_id").agg(
        F.min("h0").alias("fp_min"),
        F.max("h0").alias("fp_max"),
        F.count("*").alias("n_shingles"),
    )


# PII patterns kept to regex syntax shared by Java (Spark) and RE2
# (DuckDB) so the oracle replays them verbatim
EMAIL_RE = r"[A-Za-z0-9.+_-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def normalize_text(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Canonical text normalization for dedup/training pipelines:
    lowercase → strip non-alphanumerics → collapse whitespace → trim.
    Pure column expressions; emits the normalized text plus its md5
    (the join/dedup key downstream exact-dedup would group on)."""
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, r"[^a-z0-9 ]", " ")
    t = F.trim(F.regexp_replace(t, r" +", " "))
    return df.select(
        F.col(id_col).alias("doc_id"),
        t.alias("norm_text"),
        F.md5(t).alias("norm_hash"),
        F.length(t).alias("norm_len"),
    )


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Regex PII redaction (emails, phone-like digit runs, IPv4) —
    the masking pass a corpus takes before training. Counts each
    category before masking so the pipeline can monitor redaction
    rates. JVM regexp_replace only — no UDFs."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    masked = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(masked, F.lit(IPV4_RE), 0))
    masked = F.regexp_replace(masked, IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(masked, F.lit(PHONE_RE), 0))
    masked = F.regexp_replace(masked, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        masked.alias("redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


def vocabulary(df: DataFrame, text_col: str, id_col: str = "doc_id", top_k: int = 50) -> DataFrame:
    """Corpus vocabulary: term → document frequency + total count,
    top-k by count (ties by term). The classic explode → two-phase
    count; the shuffle carries (term, partial count) pairs, and top-k
    compiles to TakeOrderedAndProject — no global sort at 100 TB."""
    terms = df.select(
        F.col(id_col).alias("doc_id"), F.explode(F.split(F.col(text_col), " +")).alias("term")
    ).where(F.col("term") != "")
    return (
        terms.groupBy("term")
        .agg(
            F.count("*").alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_total").desc(), F.col("term"))
        .limit(top_k)
    )


def weighted_mixture(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix1",
) -> DataFrame:
    """Deterministic per-source sampling for training-data mixing.

    Each row keeps iff ``md5(salt || id) % 10000 < rate(group) * 10000``
    — the data-mixing step of a pretraining pipeline (upweight curated
    sources, downsample crawl) with ``hash_split``'s reproducibility
    guarantees: assignment depends only on (salt, id), so it is stable
    across engines, cluster sizes, and data order, and changing one
    source's rate never reshuffles another's kept set. Pure column
    expressions — the filter evaluates in the scan's project, no
    shuffle, trivially parallel at 100 TB.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        % 10000
    )
    rate = F.lit(default_rate)
    for name, r in rates.items():
        rate = F.when(F.col(group_col) == name, F.lit(r)).otherwise(rate)
    return df.withColumn("mix_bucket", bucket).where(
        F.col("mix_bucket") < (rate * 10000).cast("bigint")
    )


def hash_split(
    df: DataFrame, id_col: str, splits: dict[str, tuple[int, int]], salt: str = "v1"
) -> DataFrame:
    """Deterministic hash-based dataset splitting (train/val/test) —
    the reproducible alternative to ``df.sample``: assignment depends
    only on (salt, id), so it is stable across runs, engines, cluster
    sizes, and data order, and new rows never reshuffle old ones.

    ``splits`` maps split name -> [lo, hi) percentile band over
    md5(salt || id) % 100, e.g. {"train": (0, 80), "val": (80, 90),
    "test": (90, 100)}. Pure column expressions — no shuffle at all;
    the split column is computed in the scan's project.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    expr = F.lit(None).cast("string")
    for name, (lo, hi) in splits.items():
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr).withColumn("bucket", bucket)


def pack_sequences(
    df: DataFrame, text_col: str, id_col: str, group_col: str, token_budget: int
) -> DataFrame:
    """Streaming sequence packing: assign documents (in id order) to
    consecutive bins of ~``token_budget`` whitespace tokens — the
    context-window packing step of a training-data pipeline.

    bin = floor(cumulative_tokens_before_this_doc / budget): a document
    that crosses a boundary stays in the earlier bin (bounded overflow,
    deterministic, order-stable) — the semantics both engines can
    compute identically, unlike reset-at-boundary greedy packing which
    is inherently sequential.

    Scale shape: packing is per ``group_col`` (source/shard), so the
    window partitions by group and distributes; no global ordering is
    ever required — bin ids are (group, local bin).
    """
    from pyspark.sql import Window

    toks = F.size(F.split(F.col(text_col), " "))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_bin = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc"),
        toks.alias("n_tokens"),
        ((F.sum(toks).over(w) - toks) / token_budget).cast("bigint").alias("bin"),
    )
    return with_bin.groupBy("grp", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc").alias("first_doc"),
        F.max("doc").alias("last_doc"),
    )


def decontaminate(
    train: DataFrame, benchmark: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Training-set decontamination: drop every training doc sharing a
    word k-shingle with the benchmark/eval set — the standard guard
    against eval leakage in LLM training pipelines.

    The benchmark side reduces to a DISTINCT set of 60-bit shingle
    hashes (tiny — benchmarks are orders of magnitude smaller than the
    corpus) and broadcasts; the training side streams its shingles
    against it: a semi-join marks contaminated ids, an anti-join drops
    them. At 100 TB the training table is never shuffled — the whole
    operation is one scan plus a broadcast hash probe.

    The anti side carries an explicit broadcast hint (r16, guide §3.1):
    ``contaminated`` is a distinct-aggregate output, whose size
    Catalyst cannot estimate — without the hint the planner chose a
    SortMergeJoin that shuffled the ENTIRE training table (text
    payload included) by doc_id, contradicting the scale contract
    above, and locally serialized every downstream consumer onto the
    coalesced post-shuffle partitions. The broadcast is 8-byte doc_ids
    bounded by the contaminated fraction of the corpus — the designed
    use (eval sets orders of magnitude smaller than the corpus) keeps
    it far under the broadcast cap.
    """
    from easydb_server_spark.operators.dedup import _shingle_hash60, word_shingles

    bench_h = (
        word_shingles(benchmark, text_col, id_col, k)
        .select(_shingle_hash60(F.col("shingle")).alias("h"))
        .distinct()
    )
    train_sh = word_shingles(train, text_col, id_col, k).select(
        "doc_id", _shingle_hash60(F.col("shingle")).alias("h")
    )
    contaminated = (
        train_sh.join(F.broadcast(bench_h), "h", "left_semi").select("doc_id").distinct()
    )
    return train.join(
        F.broadcast(contaminated),
        train[id_col] == contaminated["doc_id"],
        "left_anti",
    )


def length_histogram(df: DataFrame, len_col: str, group_col: str) -> DataFrame:
    """Log2-bucketed length histogram per group (corpus shape
    analysis). The bucket is the BIT LENGTH of the integer length —
    ``length(bin(n))`` — pure integer logic: a float ``log2`` whose
    last ulp differs between engines could flip ``floor()`` across a
    power-of-two boundary; bit length cannot.
    """
    n = F.col(len_col).cast("bigint")
    bucket = F.when(n <= 0, F.lit(0)).otherwise(F.length(F.bin(n))).cast("int")
    return (
        df.select(F.col(group_col).alias("grp"), n.alias("n"), bucket.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n").alias("min_len"),
            F.max("n").alias("max_len"),
            round_ratio(F.sum("n"), F.count(F.lit(1)), 2).alias("avg_len"),
        )
    )


# the paper's "must contain at least two of" English word list
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
# characters the line-start bullet rule recognizes (the paper names
# "a bullet point"; we take the common plain-text markers)
_BULLET_PREFIXES = ["•", "‣", "▪", "- ", "* "]


def gopher_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    keep: list[str] | None = None,
) -> DataFrame:
    """The Gopher quality RULE SET (Rae et al. 2021, §A1.1) as explicit
    per-rule booleans — the published web-text filter most pipelines
    start from, complementing :func:`quality_score` (a composite
    number) and :func:`repetition_metrics` (the paper's other half).
    A document passes when ALL hold, with the paper's thresholds as
    defaults:

    - word count in [50, 100 000];
    - mean word length in [3, 10] characters;
    - hash (#) and ellipsis symbol-to-word ratios each ≤ 0.1;
    - < 90 % of lines start with a bullet marker;
    - ≤ 30 % of lines end with an ellipsis;
    - ≥ 80 % of words contain at least one alphabetic character;
    - at least 2 of {the, be, to, of, and, that, have, with} appear.

    Returns one row per doc: the measured quantities, one boolean per
    rule, and ``pass_gopher``. Everything is in-row column arithmetic
    over the split word/line arrays — a single scan, no shuffle, no
    Python; at 100 TB this is a free rider on whatever scan feeds it.

    ``keep`` (r16, guide §2.4): extra input columns carried through to
    the output verbatim — since this gate is a pure projection, a
    consumer that needs upstream per-doc columns (e.g. a dedup stage's
    ``n_paras``/``n_removed``) alongside the rule booleans would
    otherwise re-join on doc_id and re-evaluate the upstream subtree
    (often a full shuffle chain) a second time. Same contract as
    ``chunk_documents(keep=...)``.
    """
    keep = keep or []
    t = F.col(text_col)
    words = F.filter(F.split(t, "\\s+"), lambda w: w != F.lit(""))
    # two-step projection: the array-fold/filter counts materialize
    # first, so each split/fold runs ONCE per row and the exact-round
    # chain (which references its operands several times) reads cheap
    # column slots — inlining these cost a measured 3x on this query
    lines = F.split(t, "\n")
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_ellipsis = (
        F.length(t)
        - F.length(F.replace(t, F.lit("…"), F.lit("")))
        + (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
    ).cast("int")
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        *keep,
        F.size(words).alias("n_words"),
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
        ).alias("_sum_wl"),
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).alias("_n_hash"),
        n_ellipsis.alias("_n_ellipsis"),
        F.greatest(F.size(lines), F.lit(1)).alias("_n_lines"),
        F.size(F.filter(lines, _startswith_any(_BULLET_PREFIXES))).alias("_bullets"),
        F.size(F.filter(lines, _endswith_any(["...", "…"]))).alias("_ell_ends"),
        F.size(F.filter(words, _matches_alpha())).alias("_alpha"),
        F.size(F.array_intersect(F.array_distinct(words), stop_arr)).alias("n_stopwords"),
    )
    n_words = F.col("n_words")
    nw1 = F.greatest(n_words, F.lit(1))
    mean_wl = round_ratio(F.col("_sum_wl"), nw1, 6)
    word_count_ok = (n_words >= min_words) & (n_words <= max_words)
    mean_wl_ok = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    symbol_ok = (F.col("_n_hash") / nw1 <= max_symbol_ratio) & (
        F.col("_n_ellipsis") / nw1 <= max_symbol_ratio
    )
    bullet_ok = F.col("_bullets") / F.col("_n_lines") < F.lit(max_bullet_frac)
    ellipsis_ok = F.col("_ell_ends") / F.col("_n_lines") <= F.lit(max_ellipsis_frac)
    alpha_ok = F.col("_alpha") / nw1 >= F.lit(min_alpha_frac)
    stop_ok = F.col("n_stopwords") >= F.lit(min_stopwords)
    return staged.select(
        "doc_id",
        *keep,
        "n_words",
        mean_wl.alias("mean_word_len"),
        "n_stopwords",
        word_count_ok.alias("word_count_ok"),
        mean_wl_ok.alias("mean_word_len_ok"),
        symbol_ok.alias("symbol_ratio_ok"),
        bullet_ok.alias("bullet_lines_ok"),
        ellipsis_ok.alias("ellipsis_lines_ok"),
        alpha_ok.alias("alpha_words_ok"),
        stop_ok.alias("stopwords_ok"),
        (
            word_count_ok & mean_wl_ok & symbol_ok & bullet_ok
            & ellipsis_ok & alpha_ok & stop_ok
        ).alias("pass_gopher"),
    )


def _startswith_any(prefixes: list[str]):
    """One-arg lambda factory (see the HOF-arity note on _eq_term)."""

    def _f(line: F.Column) -> F.Column:
        from functools import reduce

        return reduce(
            lambda a, b: a | b, [line.startswith(p) for p in prefixes]
        )

    return _f


def _endswith_any(suffixes: list[str]):
    def _f(line: F.Column) -> F.Column:
        from functools import reduce

        return reduce(lambda a, b: a | b, [line.endswith(s) for s in suffixes])

    return _f


def _matches_alpha():
    def _f(w: F.Column) -> F.Column:
        return w.rlike("[A-Za-z]")

    return _f


C4_TERMINAL_RE = '[.!?"]$'


def c4_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    naughty_words: tuple[str, ...] = (),
    min_sentences: int = 3,
    min_words_per_line: int = 5,
) -> DataFrame:
    """The C4 cleaning rule set (Raffel et al. 2020, §2.2) — the other
    canonical published web-text filter, complementing
    :func:`gopher_rules` (quality) and :func:`gopher_repetition_rules`
    (repetition). Line-level: keep only lines that (a) end in a
    terminal punctuation mark (period / exclamation / question mark /
    end quotation, on the trimmed line), (b) carry at least
    ``min_words_per_line`` words (paper: 5), and (c) do not mention
    "javascript" (case-insensitive). Page-level: drop pages with fewer
    than ``min_sentences`` sentences after line filtering (sentence ≈
    terminal ``[.!?]`` count, the standard deterministic surrogate),
    or containing "lorem ipsum", a curly brace ``{``, or any
    ``naughty_words`` entry (the paper gates on the public
    "List of Dirty, Naughty, Obscene..." list — pass it here;
    substring semantics on the lowercased page; for the FULL published
    list, gate via :func:`match_any_substrings` — the Aho-Corasick
    path — instead of this per-entry expression chain). The paper's remaining
    step — removing three-sentence spans repeated across pages — is
    cross-doc dedup, composed separately via :func:`paragraph_dedup` /
    ``dedup.duplicate_ngram_spans``.

    Returns one row per doc: the filtered ``clean_text``, line/keep
    counts, the sentence count, one boolean per page flag, and
    ``pass_c4``.

    Scale shape: entirely in-row split/filter/concat expressions —
    zero shuffle, zero Python; rides the corpus scan like the Gopher
    gate.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(lines, _c4_line_keeper(min_words_per_line))
    clean = F.concat_ws("\n", kept)
    lt = F.lower(t)
    has_naughty = F.lit(False)
    for w in naughty_words:
        has_naughty = has_naughty | lt.contains(w.lower())
    n_sentences = F.regexp_count(clean, F.lit("[.!?]"))
    out = df.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        lt.contains("lorem ipsum").alias("has_lorem"),
        lt.contains("{").alias("has_brace"),
        has_naughty.alias("has_naughty"),
    )
    return out.withColumn(
        "pass_c4",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
        & ~F.col("has_naughty"),
    )


def _c4_line_keeper(min_words: int):
    """One-arg line-predicate factory for the C4 line filter
    (HOF-arity note on _eq_term): trimmed line ends in terminal
    punctuation, carries ≥ min_words words, no 'javascript'."""

    def _f(line):
        lt = F.trim(line)
        words = F.filter(F.split(lt, " "), _nonempty_tok)
        return (
            lt.rlike(C4_TERMINAL_RE)
            & (F.size(words) >= min_words)
            & ~F.lower(lt).contains("javascript")
        )

    return _f


def repetition_metrics(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dup_word_frac: float = 0.1,
    max_top_bigram_frac: float = 0.06,
) -> DataFrame:
    """Intra-document repetition metrics + keep flag (Gopher-style
    repetition filter — boilerplate/spam documents repeat themselves).

    Per doc: fraction of word occurrences that are repeats, and the
    share of bigram occurrences claimed by the single most frequent
    bigram. Both are classic pre-training quality gates.

    Scale shape: the bigram mode is computed by explode →
    groupBy(doc, bigram) → groupBy(doc) — two shuffles of (doc, gram)
    partials with map-side combine, never a per-row O(n²)
    array-mode scan, and the per-doc stats ride along as grouping
    columns so no join back to the corpus is needed.
    """
    words = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        words.alias("ws"),
        F.size(words).alias("n_words"),
        (F.size(words) - F.size(F.array_distinct(words))).alias("n_dup_words"),
    )
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_words") - 2, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i + 1, 2)))
    ex = base.select("doc_id", "n_words", "n_dup_words", F.explode(grams).alias("bigram"))
    per_doc = (
        ex.groupBy("doc_id", "n_words", "n_dup_words", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id", "n_words", "n_dup_words")
        .agg(F.max("n").cast("int").alias("top_bigram_n"), F.sum("n").alias("n_bigrams"))
    )
    dup_frac = round_ratio(
        F.col("n_dup_words"), F.greatest(F.col("n_words"), F.lit(1)), 6
    )
    top_frac = round_ratio(
        F.col("top_bigram_n"), F.greatest(F.col("n_bigrams"), F.lit(1)), 6
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        dup_frac.alias("dup_word_frac"),
        "top_bigram_n",
        top_frac.alias("top_bigram_frac"),
        (
            (dup_frac <= F.lit(max_dup_word_frac)) & (top_frac <= F.lit(max_top_bigram_frac))
        ).alias("keep"),
    )


# (signal, threshold) pairs exactly as published in Rae et al. 2021
# Table A1: a document is removed when the measured fraction EXCEEDS
# the threshold
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def gopher_repetition_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    thresholds: dict[str, float] | None = None,
    impl: str = "agg",
) -> DataFrame:
    """The COMPLETE Gopher repetition filter (Rae et al. 2021 §A1.1,
    Table A1) — all 13 published signals, complementing
    :func:`gopher_rules` (the quality half) and superseding
    :func:`repetition_metrics`' two-signal subset:

    - duplicate line / paragraph fraction (occurrences after the
      first, over the line/paragraph count) and the corresponding
      CHARACTER fractions (their characters over the text length);
    - top-{2,3,4}-gram character fraction: characters COVERED by any
      occurrence of the single most frequent n-gram (union of its
      word spans, including interior joining spaces), over the text
      length (ties resolved deterministically: higher count, then
      longer gram, then lexicographically greatest — the paper does
      not specify);
    - duplicate-{5..10}-gram character fraction: characters covered
      by the UNION of all occurrences of every n-gram seen more than
      once, over the text length — the paper's no-double-counting
      semantics (every fraction is genuinely ≤ 1; the naive
      (count−1)·len form exceeds 1 on repetitive docs).

    Returns the 13 measured fractions plus ``pass_repetition`` (all
    signals at or under their thresholds — override any subset via
    ``thresholds``).

    Two formulations, same results (SCALE.md measures them):

    - ``impl="agg"`` (default) — all-JVM: three linear
      partial-aggregated hash shuffles of fixed-shape gram rows.
    - ``impl="python"`` — every signal is a pure per-document
      function, so an Arrow-batched ``mapInPandas`` stage computes the
      RAW integer counts per doc (Counter over grams, merged-interval
      coverage) with ZERO exchanges; the fractions/rounding run in the
      same Spark expressions as the agg path afterwards, so the two
      impls agree bit-for-bit (BMP caveat: Python counts codepoints
      where the JVM counts UTF-16 code units, so astral-plane
      characters diverge on length-derived metrics — same caveat the
      pathological fuzz pins for every text operator).

    Scale shape (``impl="agg"``): line/paragraph signals are in-row
    array arithmetic. The nine n-gram signals flow through a HOF-free
    double explode
    (positions, then nine codegen'd struct expressions per position —
    higher-order-function gram building evaluates interpreted and was
    measured 2.3× slower), a COUNT-ONLY hash aggregate, a per-(doc, n)
    reduction yielding the flagged gram keys (duplicated grams for
    n ≥ 5, the deterministic (count, length, gram)-argmax for n ≤ 4 —
    via max_by, no sort), and a keyed probe of the exploded frame that
    recovers the flagged START positions — only the flagged tail ever
    carries positions (collecting position lists for every gram, 97%
    of which are unique, was the measured bottleneck). Covered
    characters come from an in-row merged-interval fold over each
    sorted start list (O(starts+words), not the per-token exists
    scan's O(words·starts)). SCALE.md records the formulation study.
    """
    th = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(f"unknown repetition signals: {sorted(unknown)}")
        th.update(thresholds)
    if impl == "python":
        from easydb_server_spark.queries._util import spread

        # r16: per-doc gram counting is the heavy stage; raise the
        # input's partition count to the session cores first (the
        # conformance fixtures scan into ~4 splits). Narrow rows only.
        return _rep_finalize(_rep_counts_python(spread(df), text_col, id_col), th)
    if impl != "agg":
        raise ValueError(f"impl must be 'agg' or 'python', got {impl!r}")

    t = F.col(text_col)
    total_chars = F.greatest(F.length(t), F.lit(1))

    def dup_stats(arr):
        # duplicate chars = Σ over values v of (count(v)−1)·len(v),
        # computed LINEARLY: sort the array once, then a single fold
        # adds len(x) whenever x equals its sorted predecessor (each
        # of a value's count−1 adjacent-equal pairs contributes one
        # len). The per-distinct filter scan this replaces was
        # O(lines × distinct_lines) IN-ROW — a 50k-line document cost
        # ~10⁹ string comparisons on a single row (the same
        # dial-dependent per-row cliff DSIR had before r9).
        dup_cnt = F.size(arr) - F.size(F.array_distinct(arr))
        dup_chars = F.aggregate(
            F.array_sort(arr),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).cast("bigint").alias("chars"),
            ),
            _dup_char_step,
            _acc_chars,
        )
        return dup_cnt, dup_chars

    lines = F.split(t, "\n")
    paras = F.split(t, "\n\n")
    dl_cnt, dl_chars = dup_stats(lines)
    dp_cnt, dp_chars = dup_stats(paras)

    # materialize the fold-derived counts FIRST (the exact-round chain
    # reads its operands several times; inlined folds were a measured
    # 2x on this query), ratios in the next projection
    base = df.select(
        F.col(id_col).alias("doc_id"),
        dl_cnt.alias("_dl_cnt"),
        dp_cnt.alias("_dp_cnt"),
        dl_chars.alias("_dl_chars"),
        dp_chars.alias("_dp_chars"),
        F.greatest(F.size(lines), F.lit(1)).alias("_nl"),
        F.greatest(F.size(paras), F.lit(1)).alias("_np"),
        total_chars.alias("n_chars"),
        F.split(t, " ").alias("ws"),
    ).select(
        "doc_id",
        round_ratio(F.col("_dl_cnt"), F.col("_nl"), 6).alias("dup_line_frac"),
        round_ratio(F.col("_dp_cnt"), F.col("_np"), 6).alias("dup_para_frac"),
        round_ratio(F.col("_dl_chars"), F.col("n_chars"), 6).alias("dup_line_char_frac"),
        round_ratio(F.col("_dp_chars"), F.col("n_chars"), 6).alias("dup_para_char_frac"),
        "n_chars",
        "ws",
    )

    # HOF-free gram rows: explode positions, then an ARRAY of nine
    # explicit struct expressions (ordinary codegen'd slice/concat —
    # a transform() lambda here evaluates interpreted per element),
    # filtered to valid spans after the explode
    pos = base.select(
        "doc_id",
        "ws",
        F.size("ws").alias("nw"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.size("ws") - 2, F.lit(0)))
        ).alias("i"),
    )
    nine = F.array(
        *[
            F.struct(
                F.lit(n).alias("n"),
                F.col("i").alias("pos"),
                F.concat_ws(" ", F.slice(F.col("ws"), F.col("i") + 1, n)).alias("gram"),
            )
            for n in range(2, 11)
        ]
    )
    ex = (
        pos.select("doc_id", "nw", F.explode(nine).alias("g"))
        .where(F.col("g.pos") + F.col("g.n") <= F.col("nw"))
        .select(
            "doc_id",
            F.col("g.n").alias("n"),
            F.col("g.pos").alias("pos"),
            F.col("g.gram").alias("gram"),
        )
    )
    # count-only aggregate (cheap: no per-group lists — carrying a
    # position list for every gram, 97% unique, was the measured
    # bottleneck), reduced to the per-(doc, n) FLAGGED gram keys
    key = F.struct(
        F.col("c").alias("c"), F.length("gram").alias("len"), F.col("gram").alias("gram")
    )
    cnt = ex.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    per_n = cnt.groupBy("doc_id", "n").agg(
        F.collect_list(F.when((F.col("c") > 1) & (F.col("n") >= 5), F.col("gram"))).alias(
            "dup_grams"
        ),
        F.max_by("gram", key).alias("top_gram"),
    )
    keys = per_n.select(
        "doc_id",
        "n",
        F.explode(
            F.when(F.col("n") >= 5, F.col("dup_grams")).otherwise(F.array("top_gram"))
        ).alias("gram"),
    )
    # probe the (re-derived, cheap) exploded frame with the flagged
    # keys — AQE broadcasts the key side at bench scale; at corpus
    # scale it degrades to a keyed shuffle of the gram rows, the same
    # cost the count already paid
    flagged = ex.join(keys, ["doc_id", "n", "gram"])
    starts = flagged.groupBy("doc_id").agg(
        *[
            F.collect_set(F.when(F.col("n") == n, F.col("pos"))).alias(f"starts_{n}")
            for n in range(2, 11)
        ]
    )
    joined = base.join(starts, "doc_id", "left")

    def covered_chars(n: int):
        # union coverage via ONE merged-interval fold over the sorted
        # start list: O(starts + words) per doc instead of the
        # per-token exists scan's O(words × starts)
        st = F.array_sort(
            F.coalesce(F.col(f"starts_{n}"), F.array().cast("array<int>"))
        )
        return F.aggregate(
            st,
            F.struct(
                F.lit(0).alias("end"), F.lit(0).cast("bigint").alias("chars")
            ),
            _merge_span(n),
        )["chars"]

    cov_staged = joined.select(
        "*", *[covered_chars(n).alias(f"_cov_{n}") for n in range(2, 11)]
    )
    sig_cols = []
    for n in (2, 3, 4):
        sig_cols.append(
            round_ratio(F.col(f"_cov_{n}"), F.col("n_chars"), 6).alias(
                f"top_{n}gram_char_frac"
            )
        )
    for n in range(5, 11):
        sig_cols.append(
            round_ratio(F.col(f"_cov_{n}"), F.col("n_chars"), 6).alias(
                f"dup_{n}gram_char_frac"
            )
        )
    full = cov_staged.select(
        "doc_id",
        "dup_line_frac",
        "dup_para_frac",
        "dup_line_char_frac",
        "dup_para_char_frac",
        *sig_cols,
    )
    out_cols = list(th)
    passing = None
    for c in out_cols:
        ok = F.col(c) <= F.lit(th[c])
        passing = ok if passing is None else (passing & ok)
    return full.select("doc_id", *out_cols, passing.alias("pass_repetition"))


_REP_COUNT_SCHEMA = (
    "doc_id bigint, n_chars bigint, n_lines int, dup_line_cnt int, "
    "dup_line_chars bigint, n_paras int, dup_para_cnt int, dup_para_chars bigint, "
    + ", ".join(f"cov_{n} bigint" for n in range(2, 11))
)


def _rep_counts_python(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The zero-exchange repetition formulation (r9 verdict ask #3):
    every one of the 13 signals is a pure per-document function, so an
    Arrow-batched ``mapInPandas`` stage computes the raw integer
    counts per doc — a Counter over each n's grams, flagged starts
    (argmax for n ≤ 4, duplicated for n ≥ 5), and union coverage via a
    per-token mark array — with NO shuffle anywhere. Emits counts, not
    fractions: the division/rounding runs in the same Spark
    expressions as the agg path (:func:`_rep_finalize`), so rounding
    semantics are identical by construction."""
    from collections import Counter

    import pandas as pd

    def one(text: str) -> tuple:
        if text is None:
            # replicate the agg path bit-for-bit: split(null) nulls the
            # line/paragraph stats, while the gram pipeline yields no
            # rows → coverage 0 over n_chars greatest(length(null),1)=1
            return (1, None, None, None, None, None, None, *([0] * 9))
        lines = text.split("\n")
        paras = text.split("\n\n")
        n_chars = max(len(text), 1)

        def dup(vals):
            c = Counter(vals)
            return len(vals) - len(c), sum((k - 1) * len(v) for v, k in c.items())

        dl_cnt, dl_chars = dup(lines)
        dp_cnt, dp_chars = dup(paras)
        ws = text.split(" ")
        w = len(ws)
        covs = []
        for n in range(2, 11):
            grams = [" ".join(ws[i : i + n]) for i in range(w - n + 1)]
            if not grams:
                covs.append(0)
                continue
            cnt = Counter(grams)
            if n <= 4:
                top = max(cnt.items(), key=lambda kv: (kv[1], len(kv[0]), kv[0]))[0]
                flagged = {top}
            else:
                flagged = {g for g, c in cnt.items() if c > 1}
                if not flagged:
                    covs.append(0)
                    continue
            cov = bytearray(w)
            for i, g in enumerate(grams):
                if g in flagged:
                    for j in range(i, i + n):
                        cov[j] = 1
            chars = 0
            prev = 0
            for i, word in enumerate(ws):
                if cov[i]:
                    chars += len(word) + prev
                prev = cov[i]
            covs.append(chars)
        return (n_chars, len(lines), dl_cnt, dl_chars, len(paras), dp_cnt, dp_chars, *covs)

    cols = _REP_COUNT_SCHEMA.replace(" bigint", "").replace(" int", "").split(", ")

    def counts(batches):
        for pdf in batches:
            out = [
                (int(doc_id), *one(text))
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(out, columns=cols)

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(counts, _REP_COUNT_SCHEMA)


def _rep_finalize(counts: DataFrame, th: dict[str, float]) -> DataFrame:
    """Fractions + pass flag from raw repetition counts — the Spark
    expressions shared verbatim with the agg path's arithmetic, so
    both impls round identically."""
    nc = F.col("n_chars")
    sig_cols = [
        round_ratio(F.col("dup_line_cnt"), F.greatest(F.col("n_lines"), F.lit(1)), 6).alias(
            "dup_line_frac"
        ),
        round_ratio(F.col("dup_para_cnt"), F.greatest(F.col("n_paras"), F.lit(1)), 6).alias(
            "dup_para_frac"
        ),
        round_ratio(F.col("dup_line_chars"), nc, 6).alias("dup_line_char_frac"),
        round_ratio(F.col("dup_para_chars"), nc, 6).alias("dup_para_char_frac"),
    ]
    for n in (2, 3, 4):
        sig_cols.append(
            round_ratio(F.col(f"cov_{n}"), nc, 6).alias(f"top_{n}gram_char_frac")
        )
    for n in range(5, 11):
        sig_cols.append(
            round_ratio(F.col(f"cov_{n}"), nc, 6).alias(f"dup_{n}gram_char_frac")
        )
    full = counts.select("doc_id", *sig_cols)
    out_cols = list(th)
    passing = None
    for c in out_cols:
        ok = F.col(c) <= F.lit(th[c])
        passing = ok if passing is None else (passing & ok)
    return full.select("doc_id", *out_cols, passing.alias("pass_repetition"))


def _dup_char_step(acc, x):
    """Binary merge for the adjacent-equals fold in ``dup_stats``:
    carries (previous element, duplicate chars so far) over the
    SORTED array; ``x == prev`` is null for the first element, which
    falls through to the zero branch."""
    return F.struct(
        x.alias("prev"),
        (
            acc["chars"] + F.when(x == acc["prev"], F.length(x)).otherwise(F.lit(0))
        ).alias("chars"),
    )


def _acc_chars(acc):
    """Unary finish for ``dup_stats``' fold (HOF-arity note on
    _eq_term: module-level defs, not default-arg lambdas)."""
    return acc["chars"]


def _merge_span(n: int):
    """Two-arg (accumulator, start) lambda factory for the span-union
    fold: the accumulator carries (end of covered prefix, chars so
    far). For each start p (sorted ascending), the newly-covered token
    range is [max(p, end), min(p+n, |ws|)); its characters are the
    token lengths plus the interior joining spaces, plus one more
    space when the new range is flush against the previous coverage
    (the space between token end−1 and end is then covered too)."""

    def _f(acc, p):
        end, chars = acc["end"], acc["chars"]
        s = F.greatest(p, end)
        e = F.least(p + F.lit(n), F.size("ws"))
        width = e - s
        token_chars = F.aggregate(
            F.slice(F.col("ws"), s + 1, F.greatest(width, F.lit(0))),
            F.lit(0).cast("bigint"),
            lambda a, w: a + F.length(w),
        )
        contiguous = F.when(
            (s == end) & (end > 0) & (width > 0), F.lit(1)
        ).otherwise(F.lit(0))
        add = F.when(
            width > 0, token_chars + (width - 1) + contiguous
        ).otherwise(F.lit(0).cast("bigint"))
        return F.struct(
            F.greatest(end, e).alias("end"), (chars + add).alias("chars")
        )

    return _f


def ngram_topk(df: DataFrame, text_col: str, group_col: str, n: int = 2, k: int = 10) -> DataFrame:
    """Top-k word n-grams per group by frequency (vocabulary/corpus
    analysis). Counting shuffles (group, ngram) pairs with map-side
    combine; the top-k is a per-group window over the counted result —
    never a global sort, and the heavy explode stays JVM-side.
    """
    from pyspark.sql import Window

    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    ex = df.select(F.col(group_col).alias("grp"), F.explode(grams).alias("ngram"))
    counts = ex.groupBy("grp", "ngram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("grp").orderBy(F.col("n").desc(), F.col("ngram"))
    return counts.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 128,
    overlap: int = 32,
    keep: list[str] | None = None,
) -> DataFrame:
    """Sliding-window token chunking: split each document into
    ``chunk_size``-token chunks that overlap by ``overlap`` tokens —
    the standard pre-tokenization step that turns long documents into
    context-window-sized training/retrieval units.

    Chunk i covers whitespace tokens [i·stride, i·stride + chunk_size)
    with stride = chunk_size − overlap; the last chunk is the FIRST
    one whose window reaches the document end (chunk count =
    max(0, ceil((n − chunk_size)/stride)) + 1), so every token lands
    in ≥1 chunk, consecutive chunks share exactly ``overlap`` tokens,
    and no chunk is a subset of its predecessor (a trailing
    start-inside-the-doc chunk would duplicate training/retrieval
    units). Emits (doc_id, chunk_id, n_tokens, chunk).

    Scale shape: pure column expressions — split/sequence/explode/
    slice, all JVM-side, no shuffle at all; the explode fan-out is
    tokens/stride per doc, linear in corpus token count. Downstream
    grouping keys on (doc_id, chunk_id), which is unique.

    ``keep`` (r16, guide §2.4): extra input columns carried through to
    the output verbatim — a consumer that needs per-doc metadata (e.g.
    ``source``) alongside the chunks would otherwise have to re-join
    the input on doc_id, re-evaluating the input's whole subtree (and
    its shuffles) a second time, since Catalyst shares no subtrees.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    keep = keep or []
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    # number of chunks − 1 = max(0, ceil((n − chunk_size) / stride)):
    # the last chunk is the first whose window reaches the doc end
    last = F.greatest(F.ceil((n - F.lit(chunk_size)) / F.lit(stride)), F.lit(0)).cast("int")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        *keep,
        words.alias("ws"),
        F.explode(F.sequence(F.lit(0), last)).alias("chunk_id"),
    )
    piece = F.slice(F.col("ws"), F.col("chunk_id") * stride + 1, chunk_size)
    return base.select(
        "doc_id",
        *keep,
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk"),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    seed: str = "v1",
) -> DataFrame:
    """Deterministic per-group sampling — the data-mixing step that
    up/down-weights corpus slices (by language, source, quality band)
    into a training mixture. Unlike ``df.sampleBy``, membership
    depends only on (seed, id): stable across runs, engines, cluster
    sizes and input order, and adding new rows never resamples old
    ones (the property incremental 100 TB ingestion needs).

    A row is kept iff u(id) < frac(group), where u is the first 15 hex
    digits of md5(seed:id) scaled to [0, 1) — 60 uniform bits, the
    same portable hash family as corpus_shuffle/hash_split. Pure
    column expressions, no shuffle: the keep decision happens in the
    scan's project, so at scale this is a free rider on the first
    pass over the corpus.
    """
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        / float(1 << 60)
    )
    frac = F.lit(float(default_frac))
    for grp, f in sorted(fractions.items()):
        frac = F.when(F.col(group_col) == grp, F.lit(float(f))).otherwise(frac)
    return df.withColumn("u", F.round(u, 6)).withColumn("sampled", F.round(u, 6) < frac)


def source_cap(
    df: DataFrame,
    id_col: str,
    source_col: str,
    cap: int,
    seed: str = "cap1",
    exact: bool = True,
) -> DataFrame:
    """Per-source document cap — the RefinedWeb/CCNet "domain
    balancing" step: keep at most ``cap`` documents per source so a
    single mega-domain cannot dominate the training mixture. Which
    documents survive is decided by ranking on md5(seed:id) — a
    deterministic uniform draw, so the kept set is stable across
    runs, engines and input order (and an engine-independent oracle
    can replay it exactly).

    ``exact=True`` (oracle-able reference semantics): one shuffle on
    ``source_col`` plus a per-source sort for ``row_number`` — exactly
    ``cap`` survivors per source. Sort cost is bounded by the largest
    source's row count.

    ``exact=False`` (the mega-domain path): no sort ANYWHERE. Because
    the rank key is a uniform draw, "the cap lowest-ranked of n" is
    approximated by the threshold test u < (cap/n)·2⁶⁰ — one
    map-side-combinable per-source count, broadcast back, and the
    keep decision happens in the scan's project. Kept count is
    Binomial(n, cap/n): ≈ cap ± √cap, and the kept set agrees with
    the exact path up to that boundary noise (pytest-locked). For a
    domain with billions of rows this converts the one non-linear
    stage into a pure filter.
    """
    from pyspark.sql import Window

    if not exact:
        u = F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n_src"))
        thr = F.least(F.lit(1.0), F.lit(float(cap)) / F.col("_n_src")) * float(1 << 60)
        return (
            df.join(F.broadcast(counts), source_col)
            .where(u < thr)
            .drop("_n_src")
        )
    rank_key = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(rank_key.asc(), F.col(id_col).asc())
    return df.withColumn("cap_rank", F.row_number().over(w)).where(F.col("cap_rank") <= cap)


def unigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_size: int = 200,
    materialize: bool = False,
) -> DataFrame:
    """CCNet-style unigram language-model quality signal: score each
    document by the mean log10 probability of its words under the
    corpus's own add-one-smoothed unigram distribution over the
    top-``vocab_size`` vocabulary (OOV words fall to the smoothing
    floor ``1/(N+V+1)``). Low scores flag gibberish / boilerplate /
    wrong-language text; CCNet buckets the corpus into head/middle/
    tail on exactly this kind of statistic.

    Scale shape: the vocab is explode → map-side-combined groupBy →
    ``TakeOrderedAndProject`` (top-V, ties broken by term so the set
    is engine-independent); the two corpus scalars (total word count,
    vocab size) ride a 1-row broadcast cross-join; scoring joins the
    exploded words against the V-row vocab via broadcast-hash, and
    the per-doc aggregation's shuffle carries one partial row per
    (doc, partition).

    The term-count table feeds THREE consumers (top-V vocab, the
    corpus word-count scalar, the vocab size scalar) and Catalyst
    shares no subtrees across scalar subqueries, so the static plan
    re-derives it per consumer — four corpus scans. ``materialize=
    True`` caches it (vocabulary-sized, lazy, fault-tolerant, deduped
    by plan) cutting the corpus to exactly two scans — the 100 TB
    setting, where a corpus scan costs hours. The default is False
    because at bench scale the measured cached-read overhead exceeds
    the recompute it saves (sf0.1 A/B: 0.66 s uncached vs ~1.0 s
    cached steady-state); equality of the two paths is pytest-locked.
    In a real pipeline the counts table is a reusable vocabulary
    artifact — write it once and score many batches against it.
    """
    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " +")).alias("term"),
    ).where(F.col("term") != "")
    counts = terms.groupBy("term").agg(F.count("*").alias("c"))
    if materialize:
        counts = counts.cache()
    vocab = counts.orderBy(F.col("c").desc(), F.col("term")).limit(vocab_size)
    totals = counts.agg(F.sum("c").cast("long").alias("n_words_corpus")).crossJoin(
        F.broadcast(vocab.agg(F.count("*").alias("v")))
    )
    lp = F.log10(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.col("n_words_corpus") + F.col("v") + F.lit(1))
    )
    return (
        terms.join(F.broadcast(vocab), "term", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_words"), F.round(F.avg(lp), 5).alias("mean_logprob"))
    )


def _aho_build(patterns: list[str]) -> tuple:
    """Build an Aho-Corasick automaton (goto trie + BFS failure links
    + per-node output counts) from lowercased patterns. Pure stdlib —
    the classic multi-pattern matcher: one pass over the text finds
    every (position, pattern) occurrence regardless of pattern count,
    which is what makes million-entry substring blocklists tractable
    (a per-entry scan is O(text × patterns))."""
    goto: list[dict] = [{}]
    out: list[int] = [0]
    for p in patterns:
        node = 0
        for ch in p:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                out.append(0)
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node] += 1
    from collections import deque

    fail = [0] * len(goto)
    q = deque(goto[0].values())
    while q:
        node = q.popleft()
        for ch, nxt in goto[node].items():
            q.append(nxt)
            f = fail[node]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != nxt else 0
            out[nxt] += out[fail[nxt]]
    return goto, fail, out


def _aho_count(goto: list, fail: list, out: list, text: str) -> int:
    """Count every pattern occurrence (all positions, overlapping
    included) in one pass."""
    node = 0
    n = 0
    for ch in text:
        while node and ch not in goto[node]:
            node = fail[node]
        node = goto[node].get(ch, 0)
        n += out[node]
    return n


def match_any_substrings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    patterns: tuple[str, ...] | DataFrame,
) -> DataFrame:
    """Substring-ANYWHERE matching against an arbitrarily large
    pattern list — the scale path the blocklist-table overloads
    deliberately narrow away from (:func:`url_features` matches
    keyword TABLES token-exactly because substring matching against
    10⁶ patterns is an automaton job, not a join; this is that
    automaton). Patterns may be a tuple or a single-column DataFrame
    (the published keyword blocklists' shape); matching is
    case-insensitive.

    Returns (doc_id, n_matches, any_match): every (position, pattern)
    occurrence counts, overlapping included — the exact multi-pattern
    semantics, so gating (`any_match`) and signal strength
    (`n_matches`) are both available.

    Scale shape: the pattern list is collected once on the driver
    (bounded by the blocklist, not the corpus), broadcast, and each
    executor builds the Aho-Corasick automaton ONCE per task batch
    stream; documents then flow through an Arrow-batched
    ``mapInPandas`` — one O(len(text)) pass per document regardless of
    pattern count, zero shuffle, riding the corpus scan.
    """
    from collections.abc import Iterator as _It

    import pandas as pd

    if isinstance(patterns, DataFrame):
        col = patterns.columns[0]
        # dedupe on the driver: the list is collected anyway and is
        # blocklist-bounded, so a Spark-side .distinct() would only
        # add a shuffle job in front of the collect (r16, guide §5)
        pats = [r[0].lower() for r in patterns.select(col).collect() if r[0]]
    else:
        pats = [p.lower() for p in patterns if p]
    sc = df.sparkSession.sparkContext
    bpats = sc.broadcast(sorted(set(pats)))

    # r16 (guide §4.3 — the fastest Python is C loops): below this
    # pattern count, per-pattern ``str.find`` walks (C-speed, one step
    # per OCCURRENCE) beat the per-CHARACTER Python automaton loop;
    # above it the automaton's O(len) pass wins and is the documented
    # million-entry scale path. Both count every (position, pattern)
    # occurrence, overlaps included — value-identical by construction
    # (pytest locks the two paths against each other).
    _FIND_MAX_PATTERNS = 64

    def scan(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        plist = bpats.value
        use_find = len(plist) <= _FIND_MAX_PATTERNS
        if not use_find:
            goto, fail, out = _aho_build(plist)
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    rows.append((doc_id, None, None))
                    continue
                t = text.lower()
                if use_find:
                    n = 0
                    for p in plist:
                        i = t.find(p)
                        while i != -1:
                            n += 1
                            i = t.find(p, i + 1)
                else:
                    n = _aho_count(goto, fail, out, t)
                rows.append((doc_id, n, n > 0))
            yield pd.DataFrame(rows, columns=["doc_id", "n_matches", "any_match"])

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(scan, "doc_id bigint, n_matches int, any_match boolean")


def write_nb_quality(
    pos_df: DataFrame,
    neg_df: DataFrame,
    text_col: str,
    table: str,
    vocab_size: int = 2000,
) -> None:
    """Train and persist a Naive-Bayes LOG-ODDS quality classifier —
    the contrastive scorer shape (high-quality reference corpus vs
    raw crawl) that CCNet/LLaMA-style pipelines train as a
    fastText/linear model; NB is its closed-form count-based
    counterpart, which makes the whole train+score path replayable by
    an independent engine (the conformance oracle re-derives it).

    Vocabulary = top-``vocab_size`` terms by combined count (ties by
    term); per term, Laplace-smoothed class likelihoods over the
    vocab-restricted token totals. Persists ``{table}`` (term, c_pos,
    c_neg) and ``{table}_meta`` (n_pos, n_neg, v) — the same frozen-
    artifact contract as :func:`write_unigram_lm`, so streaming
    micro-batches score against a static model.

    Scale shape: one scan per class → term-count hash aggregates →
    vocab top-k; both artifacts are vocab-bounded and broadcast at
    scoring time.
    """

    def _counts(d: DataFrame, name: str) -> DataFrame:
        return (
            d.select(F.explode(F.split(F.col(text_col), " +")).alias("term"))
            .where(F.col("term") != "")
            .groupBy("term")
            .agg(F.count("*").alias(name))
        )

    # a managed-table LOCATION can survive a dead catalog (fresh
    # session over a reused warehouse dir): DROP alone then fails with
    # LOCATION_ALREADY_EXISTS, so also clear the stale directory
    sess = pos_df.sparkSession
    for t in (table, f"{table}_meta"):
        sess.sql(f"DROP TABLE IF EXISTS {t}")
        wh = sess.conf.get("spark.sql.warehouse.dir", "")
        if wh.startswith("file:"):
            import shutil
            from urllib.parse import urlparse

            loc = os.path.join(urlparse(wh).path, t.lower())
            shutil.rmtree(loc, ignore_errors=True)

    cp, cn = _counts(pos_df, "c_pos"), _counts(neg_df, "c_neg")
    merged = cp.join(cn, "term", "full").select(
        "term",
        F.coalesce("c_pos", F.lit(0)).alias("c_pos"),
        F.coalesce("c_neg", F.lit(0)).alias("c_neg"),
    )
    vocab = merged.orderBy(
        (F.col("c_pos") + F.col("c_neg")).desc(), F.col("term")
    ).limit(vocab_size)
    vocab = vocab.localCheckpoint(eager=True)  # feeds the write AND the meta agg
    meta = vocab.agg(
        F.sum("c_pos").cast("long").alias("n_pos"),
        F.sum("c_neg").cast("long").alias("n_neg"),
        F.count("*").alias("v"),
    )
    vocab.write.mode("overwrite").format("parquet").saveAsTable(table)
    meta.write.mode("overwrite").format("parquet").saveAsTable(f"{table}_meta")


def score_nb_quality(
    df: DataFrame, text_col: str, id_col: str, spark, table: str
) -> DataFrame:
    """Score documents under a persisted NB quality model
    (:func:`write_nb_quality`): per doc, the summed log10 odds over
    its IN-VOCABULARY tokens (with multiplicity; OOV tokens carry no
    evidence in either direction, the standard NB treatment) —
    ``log_odds > 0`` reads "looks like the reference corpus".
    Returns (doc_id, n_terms, n_scored, log_odds, nb_pass).

    Scale shape: one scan of ``df`` → explode → broadcast join against
    the V-row model + 1-row meta → per-doc aggregate; nothing
    proportional to the training corpora is touched (same contract as
    :func:`score_unigram_lm`).
    """
    vocab = spark.table(table)
    totals = spark.table(f"{table}_meta")
    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " +")).alias("term"),
    ).where(F.col("term") != "")
    lo = F.log10(
        (F.col("c_pos") + F.lit(1)).cast("double") / (F.col("n_pos") + F.col("v"))
    ) - F.log10(
        (F.col("c_neg") + F.lit(1)).cast("double") / (F.col("n_neg") + F.col("v"))
    )
    scored = (
        terms.join(F.broadcast(vocab), "term", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.count("c_pos").cast("int").alias("n_scored"),
            F.round(F.coalesce(F.sum(lo), F.lit(0.0)), 5).alias("log_odds"),
        )
    )
    return scored.withColumn("nb_pass", F.col("log_odds") > 0)


def html_extract(
    df: DataFrame, html_col: str, id_col: str, keep: list[str] | None = None
) -> DataFrame:
    """HTML → text extraction — the step real crawl pipelines (CCNet,
    RefinedWeb, FineWeb) run FIRST, before any quality/dedup stage:
    strip non-content blocks and markup, keep block structure as
    newlines, unescape the common entities. Deliberately a
    deterministic regex pipeline (trafilatura-style DOM scoring needs
    an HTML parser this container lacks; the regex form is the one an
    independent engine can replay bit-for-bit):

    1. comments and ``<script>``/``<style>`` blocks (with their
       contents) are removed;
    2. ``<br>`` and closing block tags (p, div, h1-h6, li, tr) become
       newlines so paragraph boundaries survive tag stripping;
       tag matching is CASE-INSENSITIVE throughout (HTML tags are
       case-insensitive by spec and legacy crawl pages routinely use
       ``<SCRIPT>``/``</P>``/``<BR>`` — a case-sensitive match leaks
       script bodies into the clean text);
    3. every remaining tag is dropped;
    4. ``&nbsp; &lt; &gt; &quot; &#39; &amp;`` unescape (amp LAST so
       double-escapes resolve one level, the standard order);
    5. space runs collapse, blank-line runs collapse to one break,
       ends trim.

    Returns (doc_id, clean_text, n_chars, n_tags). Scale shape:
    entirely in-row regexp_replace chains — JVM regex inside the scan
    projection, zero shuffle, zero Python; at 100 TB this rides the
    raw-HTML scan like the Gopher gate rides the text scan.

    ``keep`` (r16, guide §2.4): extra input columns carried through to
    the output verbatim — a consumer needing per-doc metadata (e.g. a
    URL-gate ``domain``) alongside the extraction would otherwise have
    to re-join the input on doc_id, re-evaluating the input's whole
    subtree (Catalyst shares no subtrees). Same contract as
    ``chunk_documents(keep=...)``.
    """
    keep = keep or []
    h = F.col(html_col).cast("string")
    n_tags = F.regexp_count(h, F.lit("<[^>]*>"))
    t = F.regexp_replace(h, r"(?s)<!--.*?-->", "")
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", "")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", "")
    t = F.regexp_replace(t, r"(?i)<br[^>]*>", "\n")
    t = F.regexp_replace(t, r"(?i)</(p|div|h[1-6]|li|tr)>", "\n")
    t = F.regexp_replace(t, r"<[^>]*>", "")
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n\n")
    t = F.regexp_replace(t, r"^\s+|\s+$", "")
    return df.select(
        F.col(id_col).alias("doc_id"),
        *keep,
        t.alias("clean_text"),
        F.length(t).alias("n_chars"),
        n_tags.alias("n_tags"),
    )


def url_features(
    df: DataFrame,
    url_col: str,
    id_col: str,
    blocked_domains: tuple[str, ...] | DataFrame = (),
    blocked_keywords: tuple[str, ...] | DataFrame = (),
) -> DataFrame:
    """URL-level curation gate — the filter crawl pipelines
    (RefinedWeb §3.1, CCNet) apply BEFORE fetching or keeping a page:
    parse the URL in-row, expose the spam signals, and gate against a
    domain blocklist and a keyword list. Returns one row per doc:
    domain, tld, path_depth, n_params, digit_frac (of the domain —
    auto-generated spam hosts are digit-heavy), the two block
    booleans, and ``pass_url``.

    Blocking semantics: a domain is blocked if it equals a blocklist
    entry OR is a subdomain of one (``ads.example.com`` matches
    ``example.com``); a keyword blocks on substring anywhere in the
    lowercased URL (the published blocklists work this way).

    Blocklists come in two shapes:

    - **tuples of literals** — compiled to in-row OR chains; right for
      dozens of entries, zero shuffle.
    - **single-column DataFrames** (first column is the entry) — the
      shape the published million-entry blocklists (UT1, RefinedWeb's
      4.6M-domain list) need, where a per-entry expression chain won't
      compile. Domains equi-join the URL domain's dot-suffix set
      (``ads.example.com`` probes ``{ads.example.com, example.com,
      com}`` — bounded fan-out, so subdomain matching becomes a
      BroadcastHashJoin, never a nested loop). Keywords equi-join the
      URL's alphanumeric tokens — a DELIBERATE narrowing from the
      literal form's substring-anywhere semantics: matching a million
      substring patterns is an Aho-Corasick automaton, not a join, and
      the published keyword lists are word-shaped anyway. When true
      substring-anywhere gating against a large list is required,
      compose with :func:`match_any_substrings` (that automaton,
      Arrow-batched) over the URL column.

    Scale shape: the parse is pure in-row regexp/array arithmetic —
    zero shuffle, zero Python. Table blocklists add left-semi
    broadcast hash joins on the exploded suffix/token rows (hits
    aggregate back on doc_id): the corpus side never shuffles more
    than (doc_id, key) pairs and the blocklist side broadcasts —
    the same plan shape as the decontamination probes.
    """
    u, domain = _url_parts(url_col)
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    path_depth = F.size(F.filter(F.split(path, "/"), lambda x: x != F.lit("")))
    n_params = F.when(query == "", F.lit(0)).otherwise(F.size(F.split(query, "&")))
    dom_len = F.greatest(F.length(domain), F.lit(1))
    n_digits = F.length(domain) - F.length(F.regexp_replace(domain, "[0-9]", ""))
    dom_df = blocked_domains if isinstance(blocked_domains, DataFrame) else None
    kw_df = blocked_keywords if isinstance(blocked_keywords, DataFrame) else None
    dom_hit, kw_hit = _url_block_hits(
        u,
        domain,
        () if dom_df is not None else blocked_domains,
        () if kw_df is not None else blocked_keywords,
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        domain.alias("domain"),
        F.substring_index(domain, ".", -1).alias("tld"),
        path_depth.alias("path_depth"),
        n_params.alias("n_params"),
        # regexp-derived count materializes before the exact-round
        # chain reads it (the chain references its operands a few x)
        n_digits.alias("_n_digits"),
        dom_len.alias("_dom_len"),
        dom_hit.alias("blocked_domain"),
        kw_hit.alias("blocked_keyword"),
        *([u.alias("_url")] if kw_df is not None else []),
    ).withColumn(
        "digit_frac", round_ratio(F.col("_n_digits"), F.col("_dom_len"), 6)
    ).drop("_n_digits", "_dom_len")
    parts = F.split(F.col("domain"), r"\.")
    sufs = F.transform(F.sequence(F.lit(1), F.size(parts)), _dot_suffix(parts))
    if dom_df is not None and kw_df is not None:
        # r16 (guide §2.4 — remove shuffles outright): when BOTH
        # blocklists are tables, probe them through ONE tagged
        # explode / semi-join / per-doc aggregate instead of two
        # independent branches. Key space: ('d', suffix) for domains,
        # ('k', token) for keywords — the tags keep the two entry
        # sets disjoint, so a single leftsemi on (tag, key) matches
        # exactly what the two separate joins matched, and the
        # per-doc max(tag = ...) booleans equal the two distinct-hit
        # sets. 2 corpus re-scans → 1, 2 doc_id hit shuffles → 1;
        # the hit side stays narrow (doc_id + 2 booleans) and
        # broadcast-joins back exactly as before.
        dom_entries = dom_df.select(
            F.lit("d").alias("_tag"),
            F.lower(F.col(dom_df.columns[0]).cast("string")).alias("_bk"),
        )
        kw_entries = kw_df.select(
            F.lit("k").alias("_tag"),
            F.lower(F.col(kw_df.columns[0]).cast("string")).alias("_bk"),
        )
        # r17: no .distinct() on the build side — a leftsemi probe is
        # unchanged by duplicate build keys, and the distinct cost an
        # Exchange + two HashAggregates inside every broadcast build
        entries = F.broadcast(dom_entries.unionByName(kw_entries))
        toks = F.filter(F.split(F.col("_url"), "[^a-z0-9]+"), _nonempty_tok)
        # r17 (guide §2.3 — shuffle fewer bytes): per-doc key dedup
        # BEFORE the explode; the semi-probe and the per-doc max()
        # are idempotent in duplicates, and repeated tokens are the
        # common case in real URLs
        tagged = F.concat(
            F.transform(sufs, lambda s: F.struct(F.lit("d").alias("_tag"), s.alias("_key"))),
            F.transform(toks, lambda t: F.struct(F.lit("k").alias("_tag"), t.alias("_key"))),
        )
        exploded = base.select("doc_id", F.explode(tagged).alias("_e")).select(
            "doc_id", F.col("_e._tag").alias("_t"), F.col("_e._key").alias("_key")
        )
        hit_rows = exploded.join(
            entries,
            (F.col("_key") == F.col("_bk")) & (F.col("_t") == F.col("_tag")),
            "leftsemi",
        )
        hits = hit_rows.groupBy("doc_id").agg(
            F.max(F.col("_t") == "d").alias("_dom_hit"),
            F.max(F.col("_t") == "k").alias("_kw_hit"),
        )
        base = (
            base.join(hits, "doc_id", "left")
            .withColumn(
                "blocked_domain", F.coalesce(F.col("_dom_hit"), F.lit(False))
            )
            .withColumn(
                "blocked_keyword", F.coalesce(F.col("_kw_hit"), F.lit(False))
            )
        )
    elif dom_df is not None:
        entries = F.broadcast(
            dom_df.select(
                F.lower(F.col(dom_df.columns[0]).cast("string")).alias("_bd")
            )
        )
        hits = (
            base.select("doc_id", F.explode(sufs).alias("_suf"))
            .join(entries, F.col("_suf") == F.col("_bd"), "leftsemi")
            .select("doc_id")
            .distinct()
            .withColumn("_dom_hit", F.lit(True))
        )
        base = base.join(hits, "doc_id", "left").withColumn(
            "blocked_domain", F.coalesce(F.col("_dom_hit"), F.lit(False))
        )
    elif kw_df is not None:
        entries = F.broadcast(
            kw_df.select(
                F.lower(F.col(kw_df.columns[0]).cast("string")).alias("_bk")
            )
        )
        toks = F.filter(F.split(F.col("_url"), "[^a-z0-9]+"), _nonempty_tok)
        hits = (
            base.select("doc_id", F.explode(toks).alias("_tok"))
            .join(entries, F.col("_tok") == F.col("_bk"), "leftsemi")
            .select("doc_id")
            .distinct()
            .withColumn("_kw_hit", F.lit(True))
        )
        base = base.join(hits, "doc_id", "left").withColumn(
            "blocked_keyword", F.coalesce(F.col("_kw_hit"), F.lit(False))
        )
    return base.select(
        "doc_id",
        "domain",
        "tld",
        "path_depth",
        "n_params",
        "digit_frac",
        "blocked_domain",
        "blocked_keyword",
        (~F.col("blocked_domain") & ~F.col("blocked_keyword")).alias("pass_url"),
    )


def _url_parts(url_col: str):
    """(lowercased url, parsed domain) expressions — shared by
    url_features and the streaming crawl gate so the two can never
    drift."""
    u = F.lower(F.col(url_col).cast("string"))
    domain = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    return u, domain


def _url_block_hits(u, domain, blocked_domains, blocked_keywords):
    """(domain_hit, keyword_hit) boolean expressions for LITERAL
    blocklists (equal-or-dot-subdomain; substring-anywhere)."""
    if blocked_domains:
        dom_hit = None
        for b in blocked_domains:
            h = (domain == F.lit(b)) | domain.endswith("." + b)
            dom_hit = h if dom_hit is None else (dom_hit | h)
    else:
        dom_hit = F.lit(False)
    if blocked_keywords:
        kw_hit = None
        for k in blocked_keywords:
            h = u.contains(k)
            kw_hit = h if kw_hit is None else (kw_hit | h)
    else:
        kw_hit = F.lit(False)
    return dom_hit, kw_hit


def pass_url_expr(
    url_col: str,
    blocked_domains: tuple[str, ...] = (),
    blocked_keywords: tuple[str, ...] = (),
):
    """The URL gate as a single boolean Column (literal blocklists
    only) — usable directly on a STREAMING frame, where the
    join-shaped table overloads cannot run. Exactly url_features'
    ``pass_url`` by construction (shared expression helpers)."""
    u, domain = _url_parts(url_col)
    dom_hit, kw_hit = _url_block_hits(u, domain, blocked_domains, blocked_keywords)
    return ~dom_hit & ~kw_hit


def _dot_suffix(parts):
    """One-arg (1-based index) lambda factory for the domain
    dot-suffix set: i → parts[i:] joined with '.' (HOF-arity note on
    _eq_term — module-level factory, not a default-arg lambda)."""

    def _f(i):
        return F.array_join(F.slice(parts, i, F.size(parts) - i + 1), ".")

    return _f


def _nonempty_tok(x):
    return x != F.lit("")


def sentence_span_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span: int = 3,
    keep: str = "first",
) -> DataFrame:
    """C4's dedup step (Raffel et al. 2020 §2.2): discard all but one
    of any ``span``-sentence window occurring more than once in the
    corpus — the third member of the span-dedup family
    (:func:`paragraph_dedup` = separator-delimited units,
    ``dedup.duplicate_ngram_spans`` = word windows; this one = SENTENCE
    windows, the unit the paper used). ``keep="first"`` keeps the
    globally-first occurrence (smallest doc_id, then position — the
    paper's reading); ``keep="none"`` strips every copy
    (boilerplate reading). A duplicated span removes its sentences;
    overlapping duplicated spans union their sentence sets.

    Sentence convention (replayable by any regex engine, no
    lookbehind): sentences are the ``[^.!?]*[.!?]`` matches, trimmed —
    a trailing fragment with no terminal punctuation never enters a
    span (it can't anchor a three-SENTENCE window) and is preserved
    verbatim in the rebuild.

    Exactness: duplicated-span detection is STRING-exact — md5
    nominates candidates (corpus-wide stages shuffle digests only),
    then a window over candidate rows recounts by the actual span
    text, so a hash collision can never strip innocent content (same
    candidate-restricted verify as :func:`paragraph_dedup`).

    Returns (doc_id, clean_text, n_sents, n_removed); kept sentences
    rejoin in order, space-separated, with the unterminated tail (if
    any) appended.

    Scale shape: one corpus scan explodes spans reduced to digests in
    the scan projection; the frequency aggregate is map-side-
    combinable over 8-byte keys; flagged sentence indices aggregate
    per doc (bounded by the duplicated tail) and join back on doc_id;
    the rebuild is an in-row higher-order filter. No stage shuffles
    full corpus text outside the duplicated tail.
    """
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    from pyspark.sql import Window

    t = F.col(text_col)
    sents = F.transform(
        F.regexp_extract_all(t, F.lit(r"[^.!?]*[.!?]"), 0), _trim_elem
    )
    tail = F.trim(F.regexp_replace(t, r".*[.!?]", ""))
    base = df.select(
        F.col(id_col).alias("doc_id"), sents.alias("ss"), tail.alias("tail")
    )
    spans = (
        base.where(F.size("ss") >= span)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.size("ss") - span)
            ).alias("pos"),
            "ss",
        )
        .select(
            "doc_id",
            "pos",
            F.concat_ws(" ", F.slice("ss", F.col("pos") + 1, span)).alias("sp"),
        )
        .withColumn("h", F.md5("sp"))
    )
    freq = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") >= 2)
    )
    cand = spans.join(freq.select("h"), "h")
    w = Window.partitionBy("sp")
    verified = cand.withColumn("true_occ", F.count(F.lit(1)).over(w)).where(
        F.col("true_occ") >= 2
    )
    if keep == "first":
        order = Window.partitionBy("sp").orderBy(
            F.col("doc_id").asc(), F.col("pos").asc()
        )
        verified = verified.withColumn("_r", F.row_number().over(order)).where(
            F.col("_r") > 1
        )
    drop_idx = (
        verified.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(span - 1))
            ).alias("i"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("drop_i"))
    )
    joined = base.join(drop_idx, "doc_id", "left").select(
        "doc_id",
        "ss",
        "tail",
        F.coalesce("drop_i", F.array().cast("array<int>")).alias("drop_i"),
    )
    kept = F.filter(
        F.col("ss"), lambda s, i: ~F.array_contains(F.col("drop_i"), i)
    )
    rebuilt = F.concat_ws(" ", kept)
    clean = F.when(
        (F.col("tail") != "") & (rebuilt != ""),
        F.concat(rebuilt, F.lit(" "), F.col("tail")),
    ).otherwise(
        F.when(F.col("tail") != "", F.col("tail")).otherwise(rebuilt)
    )
    return joined.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size("ss").alias("n_sents"),
        F.size("drop_i").alias("n_removed"),
    )


def _trim_elem(x):
    """One-arg transform factory target (HOF-arity note on _eq_term)."""
    return F.trim(x)


def paragraph_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 2,
    keep: str = "none",
    sep: str = "\n\n",
) -> DataFrame:
    """Cross-document PARAGRAPH dedup — CCNet's primary dedup
    primitive (paragraph-hash dedup over the shard before LM scoring)
    and the cross-doc complement of :func:`line_dedup` (intra-doc):
    a paragraph (``\\n\\n``-separated) occurring in ≥ ``min_docs``
    distinct documents is boilerplate (cookie banners, footers,
    license blocks) and is removed. ``keep="none"`` (default) strips
    every copy — the boilerplate-removal reading; ``keep="first"``
    keeps the single globally-first copy (smallest doc_id, then
    earliest position) — the dedup reading. Returns
    (doc_id, clean_text, n_paras, n_removed); docs keep their
    unaffected paragraphs in order.

    Exactness: duplicated-paragraph detection is STRING-exact, not
    hash-approximate — the md5 pass nominates candidates (corpus-wide
    stages shuffle 32-byte digests only), then a window over the
    candidate rows recounts by the actual paragraph text, so a hash
    collision can never strip innocent content (same
    candidate-restricted verify as ``dedup.duplicate_ngram_spans``;
    the candidate shuffle is bounded by the duplicated tail).

    Scale shape: one corpus scan explodes paragraphs and reduces them
    to digests in the scan projection; the doc-frequency aggregate is
    map-side-combinable over 8-byte keys; flagged positions aggregate
    per doc (bounded by the boilerplate tail) and join back to the
    corpus on doc_id; the rebuild is an in-row higher-order filter.
    No stage shuffles full corpus text.
    """
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    from pyspark.sql import Window

    # ``sep`` is a LITERAL separator (escaped for the regex split);
    # "\n" turns this into cross-document LINE dedup — the MassiveText
    # per-domain repeated-line strip — which is how the composed crawl
    # pipeline runs it over freshly-extracted single-newline text
    import re as _re

    paras = F.split(F.col(text_col), _re.escape(sep))
    base = df.select(F.col(id_col).alias("doc_id"), paras.alias("ps"))
    exploded = base.select("doc_id", F.posexplode("ps").alias("pos", "para")).select(
        "doc_id", "pos", "para", F.md5(F.col("para")).alias("ph")
    )
    hash_freq = (
        base.select("doc_id", F.explode(F.array_distinct("ps")).alias("para"))
        .select(F.md5(F.col("para")).alias("ph"))
        .groupBy("ph")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    cand = exploded.join(hash_freq.select("ph"), "ph")
    w = Window.partitionBy("para")
    verified = cand.withColumn(
        "true_docs", F.size(F.collect_set("doc_id").over(w))
    ).where(F.col("true_docs") >= min_docs)
    if keep == "first":
        order = Window.partitionBy("para").orderBy(F.col("doc_id").asc(), F.col("pos").asc())
        verified = verified.withColumn("_r", F.row_number().over(order)).where(
            F.col("_r") > 1
        )
    drops = verified.groupBy("doc_id").agg(F.collect_set("pos").alias("drop_pos"))
    joined = base.join(drops, "doc_id", "left").select(
        "doc_id",
        "ps",
        F.coalesce("drop_pos", F.array().cast("array<int>")).alias("drop_pos"),
    )
    kept = F.filter(
        F.col("ps"), lambda p, i: ~F.array_contains(F.col("drop_pos"), i)
    )
    return joined.select(
        "doc_id",
        # null text → null row (same contract as line_dedup: concat_ws
        # over a null array would fabricate '')
        F.when(F.col("ps").isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat_ws(sep, kept))
        .alias("clean_text"),
        F.size("ps").alias("n_paras"),
        (F.size("ps") - F.size(kept)).alias("n_removed"),
    )


def write_unigram_lm(
    df: DataFrame, text_col: str, id_col: str, table: str, vocab_size: int = 200
) -> None:
    """Persist the unigram LM as a reusable scoring artifact: the
    top-``vocab_size`` term counts (``{table}``: term, c) plus the two
    corpus scalars (``{table}_meta``: n_words_corpus, v) —
    :func:`unigram_logprob`'s model half, written once so MANY later
    batches (streaming ingest micro-batches especially) score against
    a FROZEN model instead of re-training per batch. This is the CCNet
    production shape: the scorer is a static pretrained LM, not a
    function of the data being scored.

    One corpus scan + a vocab-bounded top-k; both artifacts are tiny
    (V rows, 1 row) and broadcast at scoring time.
    """
    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " +")).alias("term"),
    ).where(F.col("term") != "")
    counts = terms.groupBy("term").agg(F.count("*").alias("c"))
    vocab = counts.orderBy(F.col("c").desc(), F.col("term")).limit(vocab_size)
    vocab = vocab.localCheckpoint(eager=True)  # feeds the write AND the meta agg
    meta = counts.agg(F.sum("c").cast("long").alias("n_words_corpus")).crossJoin(
        vocab.agg(F.count("*").alias("v"))
    )
    vocab.write.mode("overwrite").format("parquet").saveAsTable(table)
    meta.write.mode("overwrite").format("parquet").saveAsTable(f"{table}_meta")


def score_unigram_lm(
    df: DataFrame, text_col: str, id_col: str, spark, table: str
) -> DataFrame:
    """Score documents under a PERSISTED unigram LM
    (:func:`write_unigram_lm`): per doc, (doc_id, n_words,
    mean_logprob) with exactly :func:`unigram_logprob`'s smoothing
    math — ``log10((c+1)/(N+V+1))``, OOV at the floor — but against
    the frozen model, so batch and streaming consumers gating on the
    same table ADMIT THE SAME DOCUMENTS by construction (the r9
    batch≡stream unification; tests/test_streaming_ingest.py locks
    the equivalence).

    Scale shape: one scan of ``df`` → explode → broadcast join against
    the V-row vocab + 1-row meta → per-doc aggregate. Nothing
    proportional to the training corpus is touched.
    """
    vocab = spark.table(table)
    totals = spark.table(f"{table}_meta")
    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " +")).alias("term"),
    ).where(F.col("term") != "")
    lp = F.log10(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.col("n_words_corpus") + F.col("v") + F.lit(1))
    )
    return (
        terms.join(F.broadcast(vocab), "term", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_words"), F.round(F.avg(lp), 5).alias("mean_logprob"))
    )


def ccnet_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_size: int = 200,
    materialize: bool = False,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style corpus partition: rank every document by its
    unigram-LM score (:func:`unigram_logprob`) and split the corpus at
    the exact 1/3 and 2/3 score percentiles into head (most fluent) /
    middle / tail buckets — the stratification CCNet publishes its
    Common Crawl releases in, and the usual knob for trading data
    quantity against quality when composing a training mixture.

    Scale shape: scoring is :func:`unigram_logprob`'s broadcast-join
    pipeline; the two cut points are scalars computed by a percentile
    aggregate and broadcast back via a 1-row cross join — the corpus
    is never globally sorted. ``exact=False`` computes the cuts with
    ``percentile_approx`` instead — a partial-aggregable sketch, the
    same trade as ``quality_prune``'s approx path, with bucket
    agreement locked within the sketch's rank error; thresholds are
    rounded so the bucket boundaries are engine-portable.
    """
    # per-doc scores feed both the threshold aggregate and the output
    # projection; materialize=True caches them (one row per document —
    # tiny next to the corpus, lazy, fault-tolerant) so the scoring
    # pipeline runs once — the at-scale setting, same bench-vs-scale
    # trade as unigram_logprob's flag
    scored = unigram_logprob(df, text_col, id_col, vocab_size, materialize=materialize)
    if materialize:
        scored = scored.cache()
    if exact:
        th = scored.agg(
            F.round(F.expr("percentile(mean_logprob, 1.0/3)"), 4).alias("t_lo"),
            F.round(F.expr("percentile(mean_logprob, 2.0/3)"), 4).alias("t_hi"),
        )
    else:
        # the 100 TB cut: percentile_approx is a partial-aggregable
        # sketch — no stage ever totally orders the scores; rank error
        # is bounded by 1/accuracy of the corpus (same trade as
        # quality_prune's approx path)
        th = scored.agg(
            F.round(F.percentile_approx("mean_logprob", 1.0 / 3, accuracy), 4).alias("t_lo"),
            F.round(F.percentile_approx("mean_logprob", 2.0 / 3, accuracy), 4).alias("t_hi"),
        )
    return scored.crossJoin(F.broadcast(th)).select(
        "doc_id",
        "mean_logprob",
        F.when(F.col("mean_logprob") >= F.col("t_hi"), "head")
        .when(F.col("mean_logprob") >= F.col("t_lo"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def tfidf_keywords(df: DataFrame, text_col: str, id_col: str, top_k: int = 5) -> DataFrame:
    """Per-document top-k keywords by smoothed tf-idf
    (idf = ln((N+1)/(df+1)) + 1, the scikit-learn smoothing) — the
    classic topical-summary / index-term extractor, and the cheap
    feature behind corpus clustering and near-topic retrieval.
    Ranking uses the ROUNDED score with term tie-breaks, so the top-k
    set is identical across engines and float environments.

    Scale shape: per-(doc, term) counts and per-term doc frequencies
    are both map-side-combinable aggregates over exploded terms; the
    scalar N rides a 1-row broadcast cross-join; the tf⋈idf join is
    keyed on the term (broadcast when the vocabulary is bounded,
    plain shuffle-hash otherwise — text never shuffles, terms do);
    the final top-k is a per-doc window whose sort is bounded by a
    single document's distinct-term count, never a global sort.
    """
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " +")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= top_k)


def _bpe_fold(a: str, b: str):
    """Greedy left-to-right BPE merge of pair (a, b) as a fold over a
    symbol array: a position merges iff it matches and its left
    neighbour did not just merge (non-overlapping scan — "aaaa" with
    (a,a) tiles to [aa][aa], "aaa" to [aa][a]). Shared by training
    (:func:`bpe_merges`) and encoding (:func:`bpe_apply`) so the two
    can never desynchronize."""

    def _fold(acc: F.Column, s: F.Column) -> F.Column:
        can_merge = (
            (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b))
        )
        return F.when(
            can_merge,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(s)))

    return _fold


def _bpe_batch_prefix(
    ranked: list, remaining: int
) -> list[tuple[str, str, int]]:
    """Select the batchable PREFIX of a ranked (l, r, cnt) pair list:
    accept pairs while each is symbol-disjoint from every previously
    accepted pair's {left, right, merged}; stop at the first conflict.

    Why a prefix and why disjointness: merging (a, b) only changes the
    counts of pairs that touch a, b, or the new token ab. A later pair
    sharing no symbol with any earlier accepted merge therefore has
    exactly the count greedy would see after those merges, and because
    we never SKIP a conflicting pair (we stop), no pair ranked between
    two accepted ones can silently outrank them. The one residual
    divergence from pure greedy: a merge can CREATE pairs involving its
    new token, and a created pair could in principle outrank a later
    batch member — hence batching is a documented near-greedy
    approximation (exact on histograms whose top pairs are independent,
    the common natural-language case) while ``batch_k=1`` remains
    byte-exact greedy.
    """
    accepted: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for row in ranked:
        if len(accepted) >= remaining:
            break
        a, b, m = row.l, row.r, row.l + row.r
        if a in used or b in used or m in used:
            break
        accepted.append((a, b, int(row.cnt)))
        used |= {a, b, m}
    return accepted


# Histograms at or below this row count train on the driver (one
# bounded collect, zero per-superstep Spark jobs); larger vocabularies
# take the Spark superstep loop unchanged. Same bounded-small-side
# discipline as kmeans.LITERAL_ARGMIN_MAX_KD / the driver-merged PQ
# training: the collect is limit-guarded (take(bound+1), never a count
# job) and the driver replays the IDENTICAL algorithm — same pair
# counting, same (cnt DESC, l, r) ranking, same non-overlapping
# left-to-right fold, same batch-prefix rule — so results are
# bit-identical to the Spark path.
BPE_DRIVER_MAX_WORDS = 4096


class _RankedPair:
    __slots__ = ("l", "r", "cnt")

    def __init__(self, l: str, r: str, cnt: int):
        self.l, self.r, self.cnt = l, r, cnt


def _bpe_merges_driver(
    head: list,
    n_merges: int,
    min_count: int,
    batch_k: int,
    stats: dict | None,
) -> list[tuple[int, str, str, str, int]]:
    """Driver-side replay of the bpe_merges superstep loop over a
    collected (word, wc, syms) histogram. Mirrors the Spark loop
    statement-for-statement (see :func:`bpe_merges`); the only change
    is where the bounded table lives."""
    vocab = [(list(r.syms), int(r.wc)) for r in head]
    merges: list[tuple[int, str, str, str, int]] = []
    supersteps = 0
    while len(merges) < n_merges:
        counts: dict[tuple[str, str], int] = {}
        for syms, wc in vocab:
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                counts[key] = counts.get(key, 0) + wc
        top = sorted(
            (
                _RankedPair(l, r, c)
                for (l, r), c in counts.items()
                if c >= min_count
            ),
            key=lambda p: (-p.cnt, p.l, p.r),
        )[: max(int(batch_k), 1)]
        supersteps += 1
        if not top:
            break
        batch = _bpe_batch_prefix(top, n_merges - len(merges))
        base = len(merges)
        merges.extend(
            (base + i, a, b, a + b, cnt) for i, (a, b, cnt) in enumerate(batch)
        )
        for a, b, _cnt in batch:
            ab = a + b
            for w in range(len(vocab)):
                syms, wc = vocab[w]
                out: list[str] = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = ab
                    else:
                        out.append(s)
                vocab[w] = (out, wc)
    if stats is not None:
        stats["supersteps"] = supersteps
    return merges


def bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_count: int = 1,
    batch_k: int = 1,
    stats: dict | None = None,
) -> DataFrame:
    """Byte-pair-encoding merge training (Sennrich et al. 2016) — the
    tokenizer-induction step of an LLM data pipeline. Learns the first
    ``n_merges`` merges over the corpus and returns the merge table
    (rank, left, right, merged, pair_count), the artifact a tokenizer
    ships with.

    Spark-first shape: the corpus collapses to the distinct-word
    frequency table in ONE shuffle (classic BPE trains on the word
    histogram, not the corpus — 100 TB of text is a few million
    distinct words), and every superstep after that runs on that
    bounded table: adjacent-pair counts via an in-row zip + one
    map-side-combinable groupBy, a top-``batch_k`` collect, then the
    greedy left-to-right merges applied per word as pure higher-order
    folds (no Python, no shuffle). The per-superstep lineage is cut
    with a lazy localCheckpoint (materialized inside the next
    superstep's collect — see the loop comment) so plan depth stays
    O(1) at one Spark job per superstep.

    ``batch_k`` is the production dial (r7 verdict ask): each superstep
    collects the top ``batch_k`` pairs and applies the symbol-disjoint
    PREFIX of them in ONE pass (chained folds inside a single
    projection), so a 30k-merge train runs ~merges/batch_k Spark jobs
    instead of one per merge (``stats["supersteps"]`` records the
    actual count; SCALE.md "BPE superstep batching" has the sweep).
    ``batch_k=1`` (default, the conformance path) is byte-exact greedy;
    ``batch_k>1`` is near-greedy — exact whenever the batched pairs are
    independent (see :func:`_bpe_batch_prefix` for the precise
    argument), which `tests/test_bpe_batch.py` locks on corpora where
    the equivalence provably holds AND on an adversarial overlapping
    corpus where the prefix rule must fall back to singles.

    The fold replicates exact greedy BPE semantics: a position merges
    iff it matches (left, right) and its left neighbour did not just
    merge — identical to the reference algorithm's non-overlapping
    left-to-right scan (e.g. run "aaaa" with pair (a,a) → [aa][aa],
    "aaa" → [aa][a]).
    """
    words = df.select(F.explode(F.split(F.col(text_col), " ")).alias("word")).where(
        F.col("word") != ""
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .select(
            "word",
            "wc",
            F.transform(
                F.sequence(F.lit(0), F.length("word") - 1),
                lambda i: F.substring(F.col("word"), i + 1, 1),
            ).alias("syms"),
        )
        .localCheckpoint(eager=False)
    )
    spark = df.sparkSession
    schema = "rank int, left string, right string, merged string, pair_count bigint"
    # Bounded histogram -> train on the driver (ONE limit-guarded
    # collect, zero superstep jobs). take() doubles as the vocab
    # materialization for the Spark fallback above the bound.
    head = vocab.take(BPE_DRIVER_MAX_WORDS + 1)
    if len(head) <= BPE_DRIVER_MAX_WORDS:
        return local_frame(
            spark, _bpe_merges_driver(head, n_merges, min_count, batch_k, stats), schema
        )
    merges: list[tuple[int, str, str, str, int]] = []
    supersteps = 0
    # Superstep job budget (r16): every localCheckpoint in this loop is
    # LAZY — it still truncates lineage (the returned frame is a
    # LogicalRDD over a persist-marked RDD) but materializes inside the
    # NEXT superstep's top-pair collect instead of as its own job. That
    # halves the loop's job count (collect+checkpoint per round ->
    # collect only) and the final round's checkpoint — which nothing
    # ever reads — never runs at all.
    while len(merges) < n_merges:
        lefts = F.slice("syms", 1, F.size("syms") - 1)
        rights = F.slice("syms", 2, F.size("syms") - 1)
        pairs = (
            vocab.where(F.size("syms") >= 2)
            .select(
                "wc",
                F.explode(
                    F.zip_with(lefts, rights, lambda x, y: F.struct(x.alias("l"), y.alias("r")))
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("cnt"))
            .where(F.col("cnt") >= min_count)
        )
        top = (
            pairs.orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(max(int(batch_k), 1))
            .collect()
        )
        supersteps += 1
        if not top:
            break
        batch = _bpe_batch_prefix(top, n_merges - len(merges))
        base = len(merges)
        merges.extend(
            (base + i, a, b, a + b, cnt) for i, (a, b, cnt) in enumerate(batch)
        )

        # all accepted merges apply in ONE projection: fold for merge 1
        # feeds fold for merge 2, … — K merges, one job, one checkpoint
        syms_col: F.Column = F.col("syms")
        for a, b, _cnt in batch:
            syms_col = F.aggregate(
                syms_col, F.array().cast("array<string>"), _bpe_fold(a, b)
            )
        vocab = vocab.select("word", "wc", syms_col.alias("syms")).localCheckpoint(
            eager=False
        )
    if stats is not None:
        stats["supersteps"] = supersteps
    return local_frame(spark, merges, schema)


def _eq_term(t: str):
    """One-arg lambda factory for F.filter (a default-arg closure would
    change the lambda's arity and be mis-read as (element, index))."""

    def _eq(w: F.Column) -> F.Column:
        return w == F.lit(t)

    return _eq


def bm25_rank(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a keyword query
    (Robertson et al.; idf form = Lucene's ``ln(1 + (N-df+0.5)/(df+0.5))``,
    which keeps idf non-negative). The full-text-retrieval primitive a
    training-data pipeline uses for targeted corpus slicing (e.g.
    pulling a topical subcorpus) and the lexical half of hybrid
    (BM25 + dense) retrieval next to the ANN operators.

    Scale shape: per-term tf and the document length are in-row
    ``filter``/``size`` expressions over the split array (the query is
    a handful of literal terms — each is one compiled predicate, no
    join against a term table); the corpus statistics (N, avgdl, per-
    term document frequencies) are ONE global aggregate — a single
    broadcast row — and the final top-k compiles to
    TakeOrderedAndProject. The corpus is scanned twice (stats, score)
    and never shuffled; at 100 TB both scans are embarrassingly
    parallel and the second can reuse a persisted stats row across
    queries.

    Determinism for the exact oracle: every input to the score is an
    integer (tf, df, N, dl, the exact long sum behind avgdl), the
    float expression applies in one fixed order, and the ranking key
    is the ROUNDed score with doc-id tie-break — bit-identical across
    engines.
    """
    if not query_terms:
        raise ValueError("bm25_rank needs at least one query term")
    words = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("dl"),
        *[
            F.size(F.filter(words, _eq_term(t))).alias(f"tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    )
    avgdl = F.col("sum_dl") / F.col("n_docs")
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5)) / (F.col(f"df{i}") + F.lit(0.5))
        )
        part = idf * (
            F.col(f"tf{i}")
            * F.lit(k1 + 1.0)
            / (F.col(f"tf{i}") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
        )
        score = part if score is None else score + part
    return (
        base.crossJoin(F.broadcast(stats))
        .select("doc_id", "dl", F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(topk)
    )


def shard_manifest(
    df: DataFrame, text_col: str, id_col: str, n_shards: int = 8, seed: str = "v1"
) -> DataFrame:
    """Deterministic manifest of a training-shard export — per shard:
    document count, whitespace-token count, and an order-insensitive
    content digest (sum of per-doc 32-bit text hashes — exact in a
    64-bit sum up to 2^31 docs per shard, far beyond any real shard).
    The shard assignment is :func:`corpus_shuffle`'s hash order, so
    the manifest is a pure function of (seed, corpus): rerunning the
    export on any cluster reproduces it bit-for-bit, and a consumer
    can verify a shard by recomputing three numbers.

    Scale shape: everything is map-side-combinable aggregation over
    the shard key — one shuffle of n_shards·partitions partial rows.
    The digest is deliberately order-insensitive (an abelian sum) so
    no per-shard sort or collect_list is needed; shard ORDER integrity
    is carried by the (shard, pos) keys the writer emits, not by the
    digest.
    """
    h = _order_hash(id_col, seed)
    th = _text_hash32(text_col)
    base = df.select(
        (h % n_shards).cast("int").alias("shard"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
        th.alias("text_h"),
    )
    return base.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("text_h").alias("content_digest"),
    )


def bpe_apply(
    df: DataFrame, text_col: str, id_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned BPE merge table (rank order) and report per-doc
    token counts — the other half of :func:`bpe_merges`: training
    produces the merge list, this encodes the corpus with it (the
    pre-training tokenize step whose output feeds chunking/packing).
    Returns (doc_id, n_words, n_chars, n_tokens) with
    n_tokens = symbols after all merges.

    Scale shape: encoding is computed once per DISTINCT word — the
    corpus collapses to its word histogram exactly like training, each
    merge applies as the same greedy left-to-right higher-order fold
    (no Python, no shuffle beyond the distinct), and documents join
    the (word → n_tokens) map broadcast-style to sum their counts.
    At 100 TB the encode cost is vocab-bounded, not corpus-bounded;
    the corpus pays one explode + one broadcast join + one groupBy.
    """

    words = df.select(
        F.col(id_col).alias("doc_id"), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where(F.col("word") != "")
    vocab = words.select("word").distinct()
    syms = F.transform(
        F.sequence(F.lit(0), F.length("word") - 1),
        lambda i: F.substring(F.col("word"), i + 1, 1),
    )
    for a, b in merges:
        syms = F.aggregate(syms, F.array().cast("array<string>"), _bpe_fold(a, b))
    encoded = vocab.select("word", F.size(syms).alias("word_tokens"))
    return (
        words.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("word_tokens").alias("n_tokens"),
        )
    )


def _dsir_features(df: DataFrame, text_col: str, id_col: str, n_buckets: int) -> DataFrame:
    """Hashed n-gram features (unigrams + bigrams) per doc → one row
    per (doc_id, bucket) occurrence. The hash is the portable md5-60bit
    used across the engine, reduced mod ``n_buckets`` — DSIR's hashing
    trick bounds the model to ``n_buckets`` rows regardless of corpus
    vocabulary, which is what makes both distributions broadcastable.
    """
    from easydb_server_spark.operators.dedup import _shingle_hash60

    words = F.split(F.col(text_col), " +")
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    feats = F.concat(words, bigrams)
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(feats).alias("f"))
        .where(F.col("f") != "")
        .select("doc_id", (_shingle_hash60(F.col("f")) % n_buckets).alias("bucket"))
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 10_000,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus
    document by ``log p_target(doc) − log p_raw(doc)`` under hashed
    bag-of-n-grams models (unigrams + bigrams hashed into
    ``n_buckets``), the published recipe for selecting raw-web data
    that looks like a target domain. Returns
    (doc_id, n_feats, log_ratio) — positive means more target-like.

    Both models are add-one-smoothed bucket distributions:
    ``p[b] = (c[b] + 1) / (N + n_buckets)``; log10s are precomputed
    per bucket so the scorer joins ONE bounded table.

    Scale shape: the raw-side counts are a map-side-combinable groupBy
    on 8-byte bucket keys (the only corpus-wide shuffle, digest-width);
    the target is orders of magnitude smaller by construction. The
    joined (bucket, log_t, log_r) table is ≤ ``n_buckets`` rows and
    BROADCASTS; scoring is one corpus scan → explode → broadcast-hash
    join → per-doc sum. Nothing quadratic, nothing driver-side.
    """
    c_feats = _dsir_features(corpus, text_col, id_col, n_buckets)
    t_feats = _dsir_features(target, text_col, id_col, n_buckets)
    # r17 (guide §2.4 — don't evaluate a subtree twice): the corpus
    # feature stream feeds BOTH the bucket histogram (model side) and
    # the scorer join, and Catalyst shares no subtrees, so the
    # explode + md5 hash of every token/bigram ran twice per corpus.
    # A lazy localCheckpoint materializes it once — inside the model
    # build (the totals broadcast) — and the scorer reads the cached
    # narrow (doc_id, bucket) rows. Consumption is strictly
    # sequential (scorer depends on the model broadcast), so the
    # lazy form never double-computes. Interleaved A/B at sf0.1:
    # 1.42 -> 1.08 s median. The 100 TB trade: ~2 narrow rows per
    # token on local disk versus re-hashing the corpus — the same
    # persist-at-the-stage-boundary call crawl_pipeline makes.
    c_feats = c_feats.localCheckpoint(eager=False)
    c_counts = c_feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    t_counts = t_feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t"))
    # grand totals are SUMS OF THE BUCKET COUNTS (every feature lands
    # in exactly one bucket), so they come from the joined bucket
    # table instead of separate corpus-rescan aggregates. The joined
    # table is materialized once (≤ n_buckets rows — bounded, tiny
    # next to the corpus) so the model build costs ONE corpus scan +
    # ONE target scan, and the totals are an ordinary DISTRIBUTED
    # scalar aggregate cross-joined back — a whole-frame window here
    # would single-thread at extreme n_buckets dials (the pre-r9 form:
    # fine at the 10k default, a cliff at caller-passed 10⁸)
    joined = (
        c_counts.join(t_counts, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("c_raw"), F.lit(0)).alias("c_raw"),
            F.coalesce(F.col("c_t"), F.lit(0)).alias("c_t"),
        )
        .localCheckpoint(eager=True)
    )
    totals = joined.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_t").alias("n_t")
    )
    model = joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log10(
                (F.col("c_t") + 1).cast("double") / (F.col("n_t") + F.lit(n_buckets))
            )
            - F.log10(
                (F.col("c_raw") + 1).cast("double") / (F.col("n_raw") + F.lit(n_buckets))
            )
        ).alias("llr"),
    )
    return (
        c_feats.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("llr"), 5).alias("log_ratio"),
        )
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    n_buckets: int = 10_000,
    seed: str = "dsir1",
    temperature: float = 1.0,
) -> DataFrame:
    """DSIR selection: Gumbel top-``k`` over the importance weights —
    sampling WITHOUT replacement proportional to ``w^(1/temperature)``
    in one pass (the Gumbel-max trick: rank by ``log w / T + g_i``).
    The noise is the engine's deterministic pseudo-random recipe,
    ``g = −ln(−ln(u))`` with ``u`` derived from md5(seed, doc_id) — the
    same seeded-hash determinism as corpus_shuffle/hash_split, so runs
    reproduce exactly and the DuckDB oracle replays bit-for-bit.
    Returns the selected (doc_id, log_ratio, key) with the ranking key.

    Scale shape: :func:`dsir_weights` plus one uniform hash column and
    a TakeOrderedAndProject top-k — no extra shuffle beyond the
    weights' per-doc aggregation.
    """
    w = dsir_weights(corpus, target, text_col, id_col, n_buckets)
    u = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col("doc_id"))), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col("log_ratio") / F.lit(float(temperature)) + gumbel, 5)
    return (
        w.select("doc_id", "log_ratio", key.alias("key"))
        .orderBy(F.col("key").desc(), F.col("doc_id"))
        .limit(k)
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lam: float = 0.7,
    materialize: bool = False,
) -> DataFrame:
    """Interpolated bigram language-model quality signal — the next
    step up from :func:`unigram_logprob` toward CCNet's KenLM scorer:
    each document's mean log10 probability under
    ``p(w|prev) = λ·c(prev,w)/c(prev) + (1−λ)·(c(w)+1)/(N+V+1)``
    (corpus-trained, add-one-smoothed unigram backoff). Bigram
    perplexity separates fluent text from shuffled/boilerplate tokens
    that unigram statistics cannot distinguish.

    Scale shape: the unigram table is vocab-bounded and broadcastable;
    the bigram-count table is bounded by DISTINCT observed bigrams
    (≤ corpus tokens — at 100 TB this is the big artifact, keyed and
    shuffled once at build, then a keyed join per scoring batch; a
    production run persists it bucketed on the pair key exactly like
    the dedup digest index). Scoring is three keyed joins + one
    map-side-combinable per-doc aggregate. Only documents with ≥2
    tokens appear (a bigram model scores pairs).

    Like :func:`unigram_logprob`, the count tables feed multiple
    consumers and Catalyst shares no subtrees across them, so the
    static plan re-derives the explodes per consumer.
    ``materialize=True`` caches the unigram and bigram count tables
    (both vocabulary-bounded, lazy, fault-tolerant) — the 100 TB
    setting where a corpus scan costs hours; at bench scale the cached
    read overhead exceeds the recompute saved, so the default is
    False. Equality of the two paths is pytest-locked.
    """
    raw = F.split(F.col(text_col), " +")
    words = F.filter(raw, lambda w: w != F.lit(""))
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("ws"))
    toks = base.select("doc_id", F.explode("ws").alias("term"))
    uni = toks.groupBy("term").agg(F.count("*").alias("cu"))
    if materialize:
        uni = uni.cache()
    totals = uni.agg(
        F.sum("cu").cast("long").alias("n_corpus"), F.count("*").alias("v")
    )
    idx = F.when(F.size("ws") >= 2, F.sequence(F.lit(0), F.size("ws") - 2)).otherwise(
        F.array().cast("array<int>")
    )
    pair_structs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(F.col("ws"), i + 1).alias("prev"),
            F.element_at(F.col("ws"), i + 2).alias("w"),
        ),
    )
    pairs = base.select("doc_id", F.explode(pair_structs).alias("p")).select(
        "doc_id", F.col("p.prev").alias("prev"), F.col("p.w").alias("w")
    )
    bi = pairs.groupBy("prev", "w").agg(F.count("*").alias("cb"))
    if materialize:
        bi = bi.cache()
    scored = (
        pairs.join(bi, ["prev", "w"])
        .join(uni.select(F.col("term").alias("prev"), F.col("cu").alias("c_prev")), "prev")
        .join(uni.select(F.col("term").alias("w"), F.col("cu").alias("c_w")), "w")
        .crossJoin(F.broadcast(totals))
    )
    p = F.lit(lam) * (F.col("cb") / F.col("c_prev")) + F.lit(1.0 - lam) * (
        (F.col("c_w") + F.lit(1)) / (F.col("n_corpus") + F.col("v") + F.lit(1))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(F.log10(p)), 5).alias("mean_logprob"),
    )


def curriculum_order(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_size: int = 200,
    n_shards: int = 8,
    seed: str = "v1",
) -> DataFrame:
    """Quality-curriculum training order: documents phased by their
    CCNet bucket (phase 0 = head/most fluent → 2 = tail) with a
    reproducible hash order within each (phase, shard) — the
    quality-descending curriculum a pre-training run consumes phase by
    phase, each phase streamed shard-parallel.

    Composition of two verified operators: :func:`ccnet_buckets`
    supplies the phase; :func:`corpus_shuffle`'s `_order_hash` supplies
    the within-phase order, sharded so no sort is ever larger than
    |phase|/n_shards — the same bounded-sort argument as the shard
    exporter, on top of ccnet's never-globally-sorted scoring.
    """
    from pyspark.sql import Window

    b = ccnet_buckets(df, text_col, id_col, vocab_size)
    phase = (
        F.when(F.col("bucket") == "head", 0)
        .when(F.col("bucket") == "middle", 1)
        .otherwise(2)
    )
    h = _order_hash("doc_id", seed)
    base = b.select(
        "doc_id", "bucket", phase.alias("phase"), h.alias("h")
    ).withColumn("shard", (F.col("h") % n_shards).cast("int"))
    w = Window.partitionBy("phase", "shard").orderBy(F.col("h"), F.col("doc_id"))
    return base.withColumn("pos", F.row_number().over(w)).select(
        "doc_id", "bucket", "phase", "shard", "pos"
    )


def line_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Intra-document duplicate-LINE removal — the MassiveText/Gopher
    curation step that strips boilerplate repeated inside one page
    (nav bars, cookie banners, repeated headers) while the cross-doc
    dedup family handles repetition ACROSS documents. Keeps each
    line's first occurrence, preserving order; returns
    (doc_id, clean_text, n_lines, n_removed).

    Scale shape: entirely in-row — the line array never leaves its
    row; the keep test is ``first occurrence index == own index``
    (higher-order filter with the (element, index) lambda form),
    O(lines²) string compares inside the row, zero shuffle, zero
    Python. Null text passes through as null across ALL columns
    (clean_text, n_lines, n_removed) — the counts are null by split's
    null propagation, and clean_text is gated explicitly because
    ``concat_ws`` over a null array would otherwise fabricate an
    empty string (round-9 ADVICE).
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(lines, lambda l, i: F.array_position(lines, l) == i + 1)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(t.isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat_ws("\n", kept))
        .alias("clean_text"),
        F.size(lines).alias("n_lines"),
        (F.size(lines) - F.size(kept)).alias("n_removed"),
    )


def ngram_novelty(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus: the
    fraction of the doc's distinct word n-grams that do not occur
    anywhere in ``reference`` — the memorization/contribution signal
    (a near-zero-novelty doc adds nothing the reference lacks; the
    dual of contamination, which flags OVERLAP). Returns
    (doc_id, n_grams, n_novel, novelty_frac), docs with no grams
    emitting 0/0/0.

    Scale shape: both sides reduce to 60-bit md5 gram digests in the
    scan projection (``array_distinct`` BEFORE exploding, so per-doc
    dedup costs no shuffle); the reference reduces to its DISTINCT
    digest set once; the probe is a left-anti join on 8-byte keys —
    broadcast when the reference digest set fits (AQE decides),
    digest-width shuffle otherwise. Corpus text is never shuffled.
    """
    from easydb_server_spark.operators.dedup import _shingle_hash60

    def grams_of(d: DataFrame) -> DataFrame:
        words = F.split(F.col(text_col), " ")
        idx = F.when(
            F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - n)
        ).otherwise(F.array().cast("array<int>"))
        g = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
        return d.select(
            F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(g)).alias("gram")
        ).select("doc_id", _shingle_hash60(F.col("gram")).alias("h"))

    doc_grams = grams_of(corpus)
    ref_set = grams_of(reference).select("h").distinct()
    # r16 (guide §2.4): totals and novel-counts in ONE pass — a left
    # join against the (distinct, so multiplicity-free) reference
    # digest set with a hit marker, then a single per-doc aggregate.
    # count(*) equals the old totals count and count(hit IS NULL)
    # equals the old anti-join count, but the expensive
    # split/transform/md5 gram scan runs once instead of twice and
    # one groupBy shuffle + aggregate-join disappears.
    marked = doc_grams.join(
        ref_set.withColumn("_hit", F.lit(True)), "h", "left"
    )
    totals = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("_hit").isNull(), 1)).alias("n_novel"),
    )
    base = corpus.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(totals, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            round_ratio(
                F.coalesce("n_novel", F.lit(0)),
                F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1)),
                6,
            ).alias("novelty_frac"),
        )
    )


def compression_ratio(df: DataFrame, text_col: str, id_col: str, level: int = 6) -> DataFrame:
    """Per-doc zlib compression ratio — the repetition/templatedness
    proxy RedPajama-v2 ships as a quality signal and Gopher-era
    pipelines gate on: highly-compressible text is boilerplate, log
    spam, or machine-generated repetition; incompressible text at the
    other extreme is often encoded junk. Returns (doc_id, raw_bytes,
    compressed_bytes, ratio) with ratio = compressed/raw rounded to
    6 dp (null text -> null row values, the line_dedup convention).

    Determinism: zlib with a pinned level is deterministic for a given
    zlib build; there is no SQL-expressible form (DEFLATE is not an
    aggregate), so the conformance entry is rows-only and the
    discriminating behavior (repetitive << natural << random) plus
    determinism are pytest-locked — the principled-substitute pattern.

    Scale shape: Arrow-batched ``mapInPandas`` riding the text scan —
    zero shuffle, embarrassingly parallel, same worker path as the
    codecs.
    """
    import pandas as pd

    def compress(batches):
        import zlib

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    out.append((doc_id, None, None, None))
                    continue
                raw = text.encode("utf-8")
                comp = zlib.compress(raw, level)
                out.append(
                    (
                        doc_id,
                        len(raw),
                        len(comp),
                        round(len(comp) / max(len(raw), 1), 6),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "raw_bytes", "compressed_bytes", "ratio"]
            )

    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        compress, "doc_id bigint, raw_bytes int, compressed_bytes int, ratio double"
    )


# line-level code-likeness signals (shared with the DuckDB oracle —
# RE2/Java-common regex subset only: classes, anchors, alternation)
CODE_LINE_PATTERNS: tuple[str, ...] = (
    r"^[ \t]{4,}",  # deep indentation
    r"[;{}][ \t]*$",  # statement/block terminators
    r"^(def |class |import |from |return |for |while |if |#include|function |var |const |let )",
    r"=>|==|!=|::|\(\)",  # operator tokens
)


def code_fraction(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-line code-likeness — the StarCoder/Pile-era signal for
    routing mixed web text: fraction of lines matching any of four
    code heuristics (deep indent, ;{} terminators, definition
    keywords, operator tokens) plus a code-fence flag. The complement
    of the C4 brace RULE (page-level boolean): this measures HOW MUCH
    of a page is code, which is what mixture construction needs
    (keep prose pages, route code-heavy pages to the code pile).
    Returns (doc_id, n_lines, n_code_lines, code_frac, has_fence);
    null text -> null values (the line_dedup convention).

    Scale shape: split + a higher-order ``filter`` with JVM regexes —
    in-row, zero shuffle, zero Python; rides the text scan.
    """
    lines = F.split(F.col(text_col), "\n")
    code_lines = F.filter(lines, _is_code_line)
    n_lines = F.size(lines)
    n_code = F.size(code_lines)
    has_fence = F.col(text_col).contains("```")
    null_text = F.col(text_col).isNull()
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(null_text, F.lit(None)).otherwise(n_lines).alias("n_lines"),
        F.when(null_text, F.lit(None)).otherwise(n_code).alias("n_code_lines"),
        F.when(null_text, F.lit(None)).otherwise(has_fence).alias("has_fence"),
    ).select(
        "doc_id",
        "n_lines",
        "n_code_lines",
        round_ratio(
            F.col("n_code_lines"), F.greatest(F.col("n_lines"), F.lit(1)), 6
        ).alias("code_frac"),
        "has_fence",
    )


def _is_code_line(x):
    """Lambda body for the code-line filter (closure-free module-level
    def — HOF arity note)."""
    out = None
    for pat in CODE_LINE_PATTERNS:
        hit = x.rlike(pat)
        out = hit if out is None else (out | hit)
    return out


# ---------------------------------------------------------------------------
# URL canonicalization + canonical-URL dedup
# ---------------------------------------------------------------------------

# Tracking parameters stripped during canonicalization (lowercased
# key= prefix match) — the published crawl-dedup recipes drop these
# because they vary per referral without changing the page.
_TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*=|fbclid=|gclid=|ref=)"


def canonical_url(url_col: str):
    """Column: the canonical form of ``url_col`` — the key crawl
    pipelines dedup on BEFORE any content fetch (the cheapest dedup in
    the stack: two pages with one canonical URL are the same page,
    no shingles needed).

    Rules (each expressible identically in Spark and ANSI/DuckDB SQL —
    plain regexp + array ops, no engine-specific URL parser, so the
    conformance oracle replays the exact function):

    * scheme and host lowercase; path/query case preserved;
    * a leading ``www.`` strips off the host;
    * an explicit default port strips (``:80`` for http, ``:443`` for
      https); other ports stay;
    * the fragment drops entirely;
    * query params: empties and tracking params (``utm_*``, ``fbclid``,
      ``gclid``, ``ref``; key match on the lowercased param) drop, the
      rest SORT bytewise so param order never splits a group;
    * trailing ``/`` runs strip from the path (so ``/a/`` == ``/a``,
      and a bare host with ``/`` == without).

    Scale shape: pure in-row string/array arithmetic — zero shuffle,
    zero Python, whole-stage-codegen friendly.
    """
    u = F.col(url_col).cast("string")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_extract(hostport, r"^([^:]+)", 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~F.lower(p).rlike(_TRACKING_PARAM_RE),
    )
    qpart = F.when(F.size(kept) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&"))
    )
    return F.concat(scheme, F.lit("://"), host, port_part, path, qpart)


def dedup_url_canonical(
    df: DataFrame, url_col: str, id_col: str, quality_col: str
) -> DataFrame:
    """Canonical-URL dedup: group documents by :func:`canonical_url`
    and keep the highest-``quality_col`` doc per group (ties to the
    smallest id). Returns one row per canonical URL:
    ``(canonical_url, keep_id, keep_quality, n_variants)``.

    Scale shape: the canonicalization is map-only; the dedup is ONE
    hash-aggregate shuffled on the canonical string — same cost as
    exact text dedup but over ~60-byte keys instead of document
    digests, and it runs at CRAWL time, before text is even fetched.
    The keeper argmax rides the same aggregate as a min(struct)
    (map-side combinable), never a window over the corpus.
    """
    canon = df.select(
        F.col(id_col).alias("__id"),
        F.col(quality_col).cast("long").alias("__q"),
        canonical_url(url_col).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.min(F.struct((-F.col("__q")).alias("nq"), F.col("__id").alias("id"))).alias("m"),
            F.count(F.lit(1)).alias("n_variants"),
        )
        .select(
            "canonical_url",
            F.col("m.id").alias("keep_id"),
            (-F.col("m.nq")).alias("keep_quality"),
            "n_variants",
        )
    )
