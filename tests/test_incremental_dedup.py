"""Incremental ingest dedup against a persistent bucketed digest index
(operators/dedup.py: digest_index / write_digest_index /
incremental_dedup).

The 100 TB ingest claim being locked: once the corpus's digest index
is written (bucketed on content_hash), deduping a NEW batch touches
the corpus text zero times — the plan scans only the digest table and
the batch, the index side of the anti-join needs no Exchange, and the
index scan reads only the content_hash column.
"""

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from easydb_server_spark.operators.dedup import (
    digest_index,
    incremental_dedup,
    write_digest_index,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def digest_table(spark):
    import shutil

    spark.sql("DROP TABLE IF EXISTS corpus_digests")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    shutil.rmtree(f"{wh}/corpus_digests", ignore_errors=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_digest_index(digest_index(docs, "text", "doc_id"), "corpus_digests", n_buckets=8)
    yield spark
    spark.sql("DROP TABLE IF EXISTS corpus_digests")


def test_incremental_dedup_admits_only_new_content(digest_table):
    spark = digest_table
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # batch = 20 re-crawled docs (already in the corpus, new ids) + 2
    # genuinely new docs + an in-batch duplicate of one of them
    recrawl = docs.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 90000).alias("doc_id"), "text"
    )
    fresh = spark.createDataFrame(
        [(99001, "colonel mustard in the library"), (99002, "with the candlestick"),
         (99003, "colonel mustard in the library")],
        "doc_id long, text string",
    )
    batch = recrawl.unionAll(fresh)
    admitted = incremental_dedup(batch, "text", "doc_id", spark.table("corpus_digests"))
    rows = {r.doc_id for r in admitted.collect()}
    # re-crawls rejected; the two new texts admitted once each, keeping
    # the smallest in-batch id
    assert rows == {99001, 99002}


def test_incremental_dedup_never_rescans_the_corpus(digest_table):
    spark = digest_table
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # partitions must match the bucket count or the planner abandons
    # the bucketed scan (autoBucketedScan) and shuffles both sides —
    # on a real cluster the index bucket count is sized to the job
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        batch = spark.createDataFrame(
            [(1, "a brand new document")], "doc_id long, text string"
        )
        out = incremental_dedup(batch, "text", "doc_id", spark.table("corpus_digests"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        # the corpus parquet never appears: the only scans are the
        # digest table and the in-memory batch
        assert "documents.parquet" not in plan
        assert "corpus_digests" in plan
        # index side is read bucketed → no Exchange feeds it; the one
        # Exchange in the plan belongs to the (small) batch side
        assert "Bucketed: true" in plan
        # exactly one Exchange node (details header "(n) Exchange"):
        # the batch-side aggregate; the index side reads co-located
        assert plan.count(") Exchange") == 1
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        # column pruning: the index scan reads only content_hash
        scan = plan[plan.index("corpus_digests") :]
        read_schema = scan[scan.index("ReadSchema") : scan.index("ReadSchema") + 200]
        assert "content_hash" in read_schema
        assert "first_id" not in read_schema and "n_copies" not in read_schema
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


@pytest.fixture(scope="module")
def minhash_tables(spark):
    import shutil

    from easydb_server_spark.operators.dedup import minhash_index, write_minhash_index

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    for t in ("corpus_mh_bands", "corpus_mh_sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where("doc_id < 200")
    bands, sigs = minhash_index(docs, "text", "doc_id")
    write_minhash_index(bands, sigs, "corpus_mh", n_buckets=8)
    yield spark
    for t in ("corpus_mh_bands", "corpus_mh_sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_neardup_finds_injected_copies(minhash_tables):
    from easydb_server_spark.operators.dedup import incremental_neardup

    spark = minhash_tables
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # batch: 8 exact copies of indexed corpus docs + 5 fresh docs
    copies = docs.where("doc_id < 8").select(
        (F.col("doc_id") + 90000).alias("doc_id"), "text"
    )
    fresh = docs.where("doc_id >= 300 AND doc_id < 305").select("doc_id", "text")
    batch = copies.unionAll(fresh)
    out = incremental_neardup(
        batch, "text", "doc_id",
        spark.table("corpus_mh_bands"), spark.table("corpus_mh_sigs"),
        threshold=0.9,
    ).collect()
    found = {(r.batch_id, r.corpus_id) for r in out}
    # each exact copy matches its original at estimate 1.0
    assert {(i + 90000, i) for i in range(8)} <= found
    exact = [r for r in out if r.batch_id - r.corpus_id == 90000]
    assert all(r.est_jaccard == 1.0 for r in exact)


def test_incremental_neardup_never_rescans_corpus_text(minhash_tables):
    """The 100 TB fuzzy-ingest claim: probing a new batch against the
    persistent MinHash index reads ONLY the two bucketed index tables
    and the batch — the corpus documents parquet never appears in the
    plan's scan list."""
    from easydb_server_spark.operators.dedup import incremental_neardup

    spark = minhash_tables
    batch = spark.createDataFrame(
        [(1, "some new document text here"), (2, "another new document")],
        "doc_id long, text string",
    )
    df = incremental_neardup(
        batch, "text", "doc_id",
        spark.table("corpus_mh_bands"), spark.table("corpus_mh_sigs"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "documents.parquet" not in plan
    assert plan.count("Scan parquet") >= 2  # the two index tables


def test_incremental_neardup_accepts_legacy_row_form_sigs(minhash_tables):
    """Schema migration: an index whose _sigs table predates the array
    layout (doc_id, i, minhash rows) must keep working across a
    restart — the adapter reassembles arrays in-plan and the result is
    identical to the array-form index."""
    from easydb_server_spark.operators.dedup import (
        incremental_neardup,
        minhash_signatures,
    )

    spark = minhash_tables
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    legacy_sigs = minhash_signatures(docs.where("doc_id < 200"), "text", "doc_id")
    batch = docs.where("doc_id < 4").select((F.col("doc_id") + 90000).alias("doc_id"), "text")
    got = incremental_neardup(
        batch, "text", "doc_id",
        spark.table("corpus_mh_bands"), legacy_sigs, threshold=0.9,
    ).collect()
    want = incremental_neardup(
        batch, "text", "doc_id",
        spark.table("corpus_mh_bands"), spark.table("corpus_mh_sigs"), threshold=0.9,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # every injected copy is found (other genuine near-dups may also match)
    assert {(i + 90000, i) for i in range(4)} <= {(r.batch_id, r.corpus_id) for r in got}
