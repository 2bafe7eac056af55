"""NULL-text drop semantics for the shingle/MinHash family (round-8
ADVICE): a null text must never produce a signature or LSH candidacy.

Regression scenario: `minhash_sig_array` (the r7 zero-shuffle form)
kept null-text docs — a null text shingles to [""] via null-skipping
concat_ws, so EVERY null-text doc got the same signature and band
keys, making them all mutual LSH candidates (spurious pairs plus a
quadratic candidate blowup on corpora with many null rows). The drop
now happens in `shingle_arrays`, the shared root of the whole family,
restoring the r6 explode-form semantics. (The conformance fixtures
carry no null text, so the DuckDB oracles are unaffected.)
"""

import pyspark.sql.functions as F


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, None),
            (3, None),
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )


def test_shingle_arrays_drops_null_text(spark):
    from easydb_server_spark.operators.dedup import shingle_arrays

    ids = [r.doc_id for r in shingle_arrays(_docs(spark), "text", "doc_id").collect()]
    assert sorted(ids) == [4, 5]


def test_minhash_sig_array_excludes_null_text(spark):
    from easydb_server_spark.operators.dedup import minhash_sig_array

    rows = minhash_sig_array(_docs(spark), "text", "doc_id").collect()
    assert sorted(r.doc_id for r in rows) == [4, 5]
    assert all(r.mins is not None for r in rows)


def test_null_text_docs_are_never_lsh_candidates(spark):
    from easydb_server_spark.operators.dedup import minhash_candidates

    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidates(_docs(spark), "text", "doc_id").collect()
    }
    assert pairs == {(4, 5)}  # not (1,2)/(1,3)/(2,3)


def test_incremental_neardup_ignores_null_batch_rows(spark):
    from easydb_server_spark.operators.dedup import incremental_neardup, minhash_index

    corpus = spark.createDataFrame(
        [(10, None), (11, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    bands, sigs = minhash_index(corpus, "text", "doc_id")
    batch = spark.createDataFrame(
        [(20, None), (21, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    hits = incremental_neardup(batch, "text", "doc_id", bands, sigs, threshold=0.5)
    assert {(r.batch_id, r.corpus_id) for r in hits.collect()} == {(21, 11)}


def test_empty_string_text_is_kept(spark):
    """'' (non-null) still shingles to [''] — only NULL is dropped, so
    the null filter can't silently widen to falsy strings."""
    from easydb_server_spark.operators.dedup import shingle_arrays

    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    got = {r.doc_id: r.shingles for r in shingle_arrays(df, "text", "doc_id").collect()}
    assert got == {1: [""]}
