"""Pathological-input differential fuzz for the text_* family (r8
verdict ask #7): unicode (BMP), empty and whitespace-only documents,
single-token documents, very-long-line documents — each drawn corpus
runs line_dedup / ngram_novelty / clip_spans / gopher_rules on Spark
AND the operator's DuckDB oracle over the SAME generated table, and
the results must agree bit-for-bit. 50 hypothesis examples × 4
properties = 200 generated corpora, every one carrying the five fixed
pathological docs plus drawn ones.

Alphabet note: BMP-only (≤ U+FFFF, no surrogates) — Spark's string
length counts UTF-16 code units while DuckDB counts codepoints, so
astral-plane characters (emoji) legitimately diverge on any
length-derived metric; the engine inherits the JVM convention and the
fuzz pins the common ground.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from easydb_server_spark.compare import canon_frame

# characters that exercise the operators' special paths: word/line
# separators, bullet markers, ellipses, hash symbols, stopword letters,
# accented/greek/CJK BMP unicode
_ALPHABET = "ab th#…•‣▪-*.\nλéß中 "

_token = st.text(alphabet=_ALPHABET.replace(" ", "").replace("\n", ""), min_size=1, max_size=6)
_sep = st.sampled_from([" ", "  ", "\n", " \n "])


@st.composite
def _doc(draw):
    toks = draw(st.lists(_token, min_size=0, max_size=12))
    if not toks:
        return ""
    seps = [draw(_sep) for _ in range(len(toks) - 1)]
    out = toks[0]
    for s, t in zip(seps, toks[1:]):
        out += s + t
    return out


# every drawn corpus ALSO contains these fixed pathological docs
_FIXED = [
    None,  # null text
    "",  # empty
    "   ",  # whitespace-only
    "\n\n\n",  # newline-only
    "solo",  # single token
    ("long " * 400).strip(),  # very long single line
    "dup\ndup\nuniq\ndup",  # intra-doc duplicate lines
    "the be to of and that have with",  # all stopwords
]


def _mk_corpus(spark, drawn: list[str]):
    texts = _FIXED + drawn
    rows = [
        (i, "src0" if i % 3 == 0 else f"src{1 + i % 2}", t)
        for i, t in enumerate(texts)
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, source string, text string")
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]),
    )
    return sdf, con


def _assert_match(sdf, odf, ctx):
    scols, srows = canon_frame(sdf)
    ocols, orows = canon_frame(odf)
    assert scols == ocols, ctx
    assert srows == orows, (ctx, next(((a, b) for a, b in zip(srows, orows) if a != b), None))


_SETTINGS = dict(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# raw-text line_dedup oracle (the conformance entry builds synthetic
# multi-line docs; the fuzz needs the operator's semantics on ARBITRARY
# text, nulls included — null text → null counts AND null clean_text)
_LINE_DEDUP_SQL = """
WITH l AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM documents),
kept AS (
  SELECT doc_id, text, ls,
         list_filter(ls, (x, i) -> list_position(ls, x) = i) AS kl
  FROM l
)
SELECT doc_id,
       CASE WHEN text IS NULL THEN NULL ELSE array_to_string(kl, chr(10)) END AS clean_text,
       CAST(len(ls) AS INT) AS n_lines,
       CAST(len(ls) - len(kl) AS INT) AS n_removed
FROM kept ORDER BY doc_id
"""


@settings(**_SETTINGS)
@given(drawn=st.lists(_doc(), min_size=1, max_size=6))
def test_line_dedup_pathological(spark, drawn):
    from easydb_server_spark.operators.text import line_dedup

    sdf_in, con = _mk_corpus(spark, drawn)
    got = line_dedup(sdf_in, "text", "doc_id").orderBy("doc_id").toPandas()
    want = con.execute(_LINE_DEDUP_SQL).df()
    _assert_match(got, want, drawn)


@settings(**_SETTINGS)
@given(drawn=st.lists(_doc(), min_size=1, max_size=6))
def test_ngram_novelty_pathological(spark, drawn):
    import pyspark.sql.functions as F

    from easydb_server_spark.operators.text import ngram_novelty
    from easydb_server_spark.queries.llmops import ORACLE_TEXT_NGRAM_NOVELTY

    sdf_in, con = _mk_corpus(spark, drawn)
    ref = sdf_in.where(F.col("source") == "src0").select("doc_id", "text")
    corpus = sdf_in.where(F.col("source") != "src0").select("doc_id", "text")
    got = ngram_novelty(corpus, ref, "text", "doc_id", n=3).orderBy("doc_id").toPandas()
    want = con.execute(ORACLE_TEXT_NGRAM_NOVELTY).df()
    _assert_match(got, want, drawn)


@settings(**_SETTINGS)
@given(drawn=st.lists(_doc(), min_size=1, max_size=6))
def test_clip_spans_pathological(spark, drawn):
    import pyspark.sql.functions as F

    from easydb_server_spark.operators.dedup import clip_contaminated_spans
    from easydb_server_spark.queries.llmops import ORACLE_TEXT_CLIP_SPANS

    sdf_in, con = _mk_corpus(spark, drawn)
    bench = sdf_in.where(F.col("source") == "src0").select("doc_id", "text")
    corpus = sdf_in.where(F.col("source") != "src0").select("doc_id", "text")
    got = (
        clip_contaminated_spans(corpus, bench, "text", "doc_id", n=3)
        .where(F.col("n_removed") > 0)
        .orderBy("doc_id")
        .toPandas()
    )
    want = con.execute(ORACLE_TEXT_CLIP_SPANS).df()
    _assert_match(got, want, drawn)


@settings(**_SETTINGS)
@given(
    drawn=st.lists(_doc(), min_size=1, max_size=6),
    min_words=st.integers(0, 10),
)
def test_gopher_rules_pathological(spark, drawn, min_words):
    from easydb_server_spark.operators.text import gopher_rules
    from easydb_server_spark.queries.llmops import _oracle_gopher

    sdf_in, con = _mk_corpus(spark, [d for d in drawn])
    # gopher_rules length arithmetic needs non-null text (the operator
    # contract — batch/stream callers gate nulls at ingest)
    sdf_nn = sdf_in.where(sdf_in.text.isNotNull()).select("doc_id", "text")
    con.execute("CREATE OR REPLACE VIEW docs_nn AS SELECT doc_id, text FROM documents WHERE text IS NOT NULL")
    got = (
        gopher_rules(sdf_nn, "text", "doc_id", min_words=min_words, min_stopwords=1)
        .orderBy("doc_id")
        .toPandas()
    )
    want = con.execute(
        _oracle_gopher(min_words=min_words, min_stop=1).replace("FROM documents", "FROM docs_nn")
    ).df()
    _assert_match(got, want, (drawn, min_words))
