"""Fuzzy/digest index compaction (r7 verdict ask #7): append-mode
ingest grows file counts per micro-batch and leaves superseded rows
behind when a doc_id is re-admitted; compaction must reset both while
keeping probe RESULTS identical and probe PLANS exchange-free on the
index side across append/compact cycles."""

import contextlib
import io
import uuid
from pathlib import Path

import pyspark.sql.functions as F
import pytest


def _table_files(spark, table):
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
        "file:"
    )
    return [p for p in Path(f"{wh}/{table}").glob("*.parquet") if p.is_file()]


TEXTS = [
    "every morning the market opens with traders shouting numbers across the floor",
    "meanwhile in the quiet library a student turns pages slowly taking careful notes",
    "a completely different story about ships and tides is told here by old sailors",
    "the quick brown fox jumps over the lazy dog and then runs far away to the hills",
    "rain fell on the tin roof all night while the river rose slowly past the bridge",
    "the committee reviewed the annual budget line by line before the final vote",
]


@pytest.fixture()
def fuzzy_prefix(spark):
    prefix = f"cmp_mh_{uuid.uuid4().hex[:8]}"
    yield prefix
    for t in (f"{prefix}_bands", f"{prefix}_sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _append_batch(spark, prefix, rows, batch_id, n_buckets=4):
    from easydb_server_spark.operators.dedup import (
        bands_from_sig_array,
        minhash_sig_array,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_sig_array(docs, "text", "doc_id").localCheckpoint(eager=True)
    for df, table, key in (
        (bands_from_sig_array(sig), f"{prefix}_bands", "band_hash"),
        (sig, f"{prefix}_sigs", "doc_id"),
    ):
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("append")
            .format("parquet")
            .saveAsTable(table)
        )


def _probe(spark, prefix, batch_rows):
    from easydb_server_spark.operators.dedup import incremental_neardup

    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    return incremental_neardup(
        batch,
        "text",
        "doc_id",
        spark.table(f"{prefix}_bands"),
        spark.table(f"{prefix}_sigs"),
        threshold=0.9,
    )


def test_compaction_preserves_probe_results_and_resets_growth(spark, fuzzy_prefix):
    from easydb_server_spark.operators.dedup import compact_minhash_index

    prefix = fuzzy_prefix
    # 4 append cycles, one doc per batch plus a RE-ADMITTED doc_id 0
    # whose content changes in batch 3 (the superseded-row case)
    for b, rows in enumerate(
        [
            [(0, TEXTS[0]), (1, TEXTS[1])],
            [(2, TEXTS[2])],
            [(3, TEXTS[3]), (0, TEXTS[4])],  # doc 0 re-admitted, new text
            [(4, TEXTS[5])],
        ]
    ):
        _append_batch(spark, prefix, rows, b)

    probe_rows = [(100, TEXTS[4]), (101, TEXTS[2]), (102, "entirely novel text here")]
    before = sorted(map(tuple, _probe(spark, prefix, probe_rows).collect()))
    files_before = len(_table_files(spark, f"{prefix}_sigs"))

    stats = compact_minhash_index(spark, prefix, n_buckets=4)
    for t in (f"{prefix}_sigs", f"{prefix}_bands"):
        spark.catalog.refreshTable(t)

    # superseded signature for doc 0 dropped: one row per doc_id, the
    # newest batch winning
    sigs = spark.table(f"{prefix}_sigs")
    assert stats["sigs_rows"] == 5
    per_doc = {r.doc_id: r.batch_id for r in sigs.collect()}
    assert per_doc[0] == 2  # batch 2's re-admission won
    # bands regenerate from kept sigs: 4 bands per doc
    assert stats["bands_rows"] == 20

    # probe results: identical EXCEPT matches against doc 0's stale
    # superseded signature may drop; here probe doc 100 matches doc 0's
    # NEWEST text, so the full result set is preserved
    after = sorted(map(tuple, _probe(spark, prefix, probe_rows).collect()))
    assert after == before
    assert {(r[0], r[1]) for r in after} >= {(100, 0), (101, 2)}

    # file growth reset: 4 appends left >= 2x the compacted count
    files_after = len(_table_files(spark, f"{prefix}_sigs"))
    assert files_after <= 4  # one per bucket
    assert files_before >= 2 * files_after


def test_probe_plan_stays_exchange_free_across_cycles(spark, fuzzy_prefix):
    """The 100 TB property the bucketed layout buys: after N
    append/compact cycles the probe's index sides still read bucketed —
    no Exchange feeds them (only the small batch side shuffles), and
    the corpus text never appears in the scan list."""
    from easydb_server_spark.operators.dedup import compact_minhash_index

    prefix = fuzzy_prefix
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        for cycle in range(3):
            _append_batch(
                spark, prefix, [(10 * cycle + i, t) for i, t in enumerate(TEXTS)], cycle
            )
            compact_minhash_index(spark, prefix, n_buckets=4)
            for t in (f"{prefix}_sigs", f"{prefix}_bands"):
                spark.catalog.refreshTable(t)
            df = _probe(spark, prefix, [(999, TEXTS[0])])
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            # both index tables read BUCKETED — no Exchange ever feeds
            # an index scan, the property that keeps per-batch probe
            # cost independent of index size
            assert f"{prefix}_bands" in plan and f"{prefix}_sigs" in plan
            assert plan.count("Bucketed: true") == 2, f"cycle {cycle}:\n{plan}"
            assert "disabled by query planner" not in plan, f"cycle {cycle}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def test_compact_digest_index_keeps_first_admission(spark):
    from easydb_server_spark.operators.dedup import compact_digest_index

    table = f"cmp_dg_{uuid.uuid4().hex[:8]}"
    try:
        for b in range(3):
            df = spark.createDataFrame(
                [(f"h{i}", 100 * b + i, b) for i in range(4)]
                + ([("h0", 999, b)] if b == 2 else []),  # replay duplicate
                "content_hash string, first_id long, batch_id int",
            )
            df.write.bucketBy(4, "content_hash").sortBy("content_hash").mode(
                "append"
            ).format("parquet").saveAsTable(table)
        kept = compact_digest_index(spark, table, n_buckets=4)
        spark.catalog.refreshTable(table)
        assert kept == 4  # h0..h3, one row each
        rows = {r.content_hash: (r.first_id, r.batch_id) for r in spark.table(table).collect()}
        assert rows["h0"] == (0, 0)  # earliest admission won
        assert len(_table_files(spark, table)) <= 4
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_streaming_pipeline_resumes_after_offline_compaction(spark, tmp_path):
    """The ops pattern compaction is FOR: run the ingest pipeline, stop
    it, compact both persistent indexes offline, land more files,
    restart on the same checkpoint — exact and fuzzy rejection must
    keep working against the compacted tables, and the new batch's
    appends must land cleanly on the rewritten (re-bucketed) layout.

    (In-band compaction inside a running stream is deliberately NOT
    offered: deleting a re-admitted doc's superseded signature can
    change the admit list a crash-replayed micro-batch computes —
    offline compaction between runs has no such window.)
    """
    import json
    import os
    import uuid as _uuid

    from easydb_server_spark.operators.dedup import (
        compact_digest_index,
        compact_minhash_index,
    )
    from easydb_server_spark.streaming.ingest import DOC_SCHEMA, stream_ingest_pipeline

    table = f"cmp_pipe_{_uuid.uuid4().hex[:8]}"
    prefix = f"cmp_pmh_{_uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"

    def write_docs(name, rows, order):
        in_dir.mkdir(parents=True, exist_ok=True)
        p = in_dir / name
        p.write_text(
            "".join(
                json.dumps({"doc_id": i, "text": t, "source": "s"}) + "\n"
                for i, t in rows
            )
        )
        t = 1_700_000_000 + order * 60
        os.utime(p, (t, t))

    def run():
        src = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = stream_ingest_pipeline(
            src, "text", "doc_id", table, str(admitted), str(ckpt),
            neardup_prefix=prefix, neardup_threshold=0.9,
        )
        q.awaitTermination()

    try:
        # long base text: a 1-word drop must stay >= 15/16 signature
        # agreement to trip the 0.9 fuzzy gate (short texts land ~0.875)
        long_base = TEXTS[1] + " " + TEXTS[2]
        write_docs("b0.json", [(1, TEXTS[0]), (2, long_base)], 0)
        write_docs("b1.json", [(3, TEXTS[2])], 1)
        run()
        # offline compaction between runs
        compact_minhash_index(spark, prefix, n_buckets=16)
        compact_digest_index(spark, table, n_buckets=16)
        for t in (table, f"{prefix}_bands", f"{prefix}_sigs"):
            spark.catalog.refreshTable(t)
        # new files: exact dup of 1, near-dup of 2, fresh doc
        near = " ".join(long_base.split()[1:])
        write_docs("b2.json", [(10, TEXTS[0]), (11, near), (12, TEXTS[3])], 2)
        run()
        ids = {r.doc_id for r in spark.read.parquet(str(admitted)).collect()}
        assert ids == {1, 2, 3, 12}, ids
        spark.catalog.refreshTable(f"{prefix}_sigs")
        sig_docs = {
            r.doc_id
            for r in spark.table(f"{prefix}_sigs").select("doc_id").distinct().collect()
        }
        assert sig_docs == {1, 2, 3, 12}
    finally:
        for t in (table, f"{prefix}_bands", f"{prefix}_sigs"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
