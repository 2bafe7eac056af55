"""Continuous-ingest dedup (streaming/ingest.py): cross-batch exact
dedup whose only state is the persistent bucketed digest index —
stream/batch equivalence, restart recovery, and replay idempotence."""

import json
import os
import uuid

import pyspark.sql.functions as F


def _write_docs(path, rows, order=0):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        "".join(
            json.dumps({"doc_id": i, "text": t, "source": s}) + "\n" for (i, t, s) in rows
        )
    )
    # FileStreamSource batches in mtime order; spaced mtimes make the
    # batch sequence (and thus cross-batch keeper ids) deterministic
    t = 1_700_000_000 + order * 60
    os.utime(path, (t, t))


def _run(spark, in_dir, index_table, admitted, ckpt, max_files=1):
    from easydb_server_spark.streaming.ingest import stream_incremental_dedup

    src = (
        spark.readStream.schema(_schema())
        .option("maxFilesPerTrigger", max_files)
        .json(str(in_dir))
    )
    q = stream_incremental_dedup(
        src, "text", "doc_id", index_table, str(admitted), str(ckpt)
    )
    q.awaitTermination()


def _schema():
    from easydb_server_spark.streaming.ingest import DOC_SCHEMA

    return DOC_SCHEMA


def test_stream_dedup_matches_batch_first_appearance(spark, tmp_path):
    """Three micro-batches (one file each) with duplicate content
    within and across batches: every distinct hash is admitted exactly
    once, and the admitted set equals the batch-mode answer."""
    table = f"ingest_idx_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"
    _write_docs(in_dir / "b0.json", [(1, "alpha", "s"), (2, "beta", "s"), (3, "alpha", "s")], order=0)
    _write_docs(in_dir / "b1.json", [(4, "beta", "s"), (5, "gamma", "s")], order=1)
    _write_docs(in_dir / "b2.json", [(6, "alpha", "s"), (7, "delta", "s"), (8, "delta", "s")], order=2)
    try:
        _run(spark, in_dir, table, admitted, ckpt)
        out = spark.read.parquet(str(admitted))
        rows = out.collect()
        # one admission per distinct content hash, ever
        assert len(rows) == len({r.content_hash for r in rows}) == 4
        # keeper for each hash is its first-ever appearance (batch order
        # = file order, within-batch keeper = min doc_id)
        by_hash = {r.content_hash: r.doc_id for r in rows}
        texts = {1: "alpha", 2: "beta", 5: "gamma", 7: "delta"}
        got_ids = set(by_hash.values())
        assert got_ids == set(texts), got_ids
        # index agrees with the admitted output
        idx = spark.table(table).collect()
        assert {(r.content_hash, r.first_id) for r in idx} == {
            (r.content_hash, r.doc_id) for r in rows
        }
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_restart_resumes_from_checkpoint_without_readmitting(spark, tmp_path):
    """Stop after two batches, land a third file whose content repeats
    batch 0, restart on the SAME checkpoint + index: old content is
    not re-admitted, genuinely new content is."""
    table = f"ingest_idx_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"
    _write_docs(in_dir / "b0.json", [(1, "alpha", "s"), (2, "beta", "s")], order=0)
    _write_docs(in_dir / "b1.json", [(3, "gamma", "s")], order=1)
    try:
        _run(spark, in_dir, table, admitted, ckpt)
        n_first = spark.read.parquet(str(admitted)).count()
        assert n_first == 3
        # second run: a re-crawl of alpha/beta plus one new doc
        _write_docs(in_dir / "b2.json", [(10, "alpha", "s"), (11, "beta", "s"), (12, "epsilon", "s")], order=2)
        _run(spark, in_dir, table, admitted, ckpt)
        out = spark.read.parquet(str(admitted))
        assert out.count() == 4  # only epsilon was new
        assert out.where(F.col("doc_id").isin(10, 11)).count() == 0
        assert out.where(F.col("doc_id") == 12).count() == 1
        # every hash still admitted exactly once
        assert out.select("content_hash").distinct().count() == 4
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_batch_replay_is_idempotent(spark, tmp_path):
    """Re-invoking the foreachBatch body with the same batch_id (what
    Spark does when a batch crashes mid-commit) recomputes the same
    admit list and overwrites — not duplicates — its output, because
    the index probe excludes the replayed batch's own digests."""
    from easydb_server_spark.streaming.ingest import stream_incremental_dedup

    table = f"ingest_idx_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"
    _write_docs(in_dir / "b0.json", [(1, "alpha", "s"), (2, "beta", "s")])
    try:
        _run(spark, in_dir, table, admitted, ckpt)
        # simulate the crash-replay of batch 0: a fresh query (new
        # checkpoint) re-processes the same file under the same
        # batch_id=0 against an index that already holds batch 0's
        # digests — exactly the state a mid-commit crash leaves behind
        src = spark.readStream.schema(_schema()).json(str(in_dir))
        handle = stream_incremental_dedup(
            src, "text", "doc_id", table, str(admitted), str(tmp_path / "ckpt2")
        )
        handle.awaitTermination()
        out = spark.read.parquet(str(admitted))
        # alpha/beta still admitted exactly once each (partition
        # overwrite + batch_id-scoped index probe)
        assert out.count() == 2
        assert out.select("content_hash").distinct().count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_pipeline_quality_gate_exact_and_fuzzy_rejection(spark, tmp_path):
    """Full ingest-curation pipeline across three micro-batches: the
    quality gate drops junk, the digest index drops exact re-crawls,
    and the MinHash band index drops near-duplicates (truncated
    re-crawls) — while genuinely new documents are admitted."""
    from easydb_server_spark.streaming.ingest import stream_ingest_pipeline

    table = f"pipe_idx_{uuid.uuid4().hex[:8]}"
    prefix = f"pipe_mh_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"
    good = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away to the hills where it finds a quiet place to rest at last"
    )
    other = (
        "a completely different story about ships and tides is told here "
        "sailors cross the open sea and chart the stars to find the way home"
    )
    near = " ".join(good.split()[1:])  # first word dropped -> near-dup
    junk = "!!! ??? ,,, ;;;"  # punctuation soup fails the quality gate
    _write_docs(in_dir / "b0.json", [(1, good, "s")], order=0)
    _write_docs(in_dir / "b1.json", [(2, other, "s"), (3, junk, "s")], order=1)
    _write_docs(in_dir / "b2.json", [(4, good, "s"), (5, near, "s")], order=2)
    try:
        src = (
            spark.readStream.schema(_schema())
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = stream_ingest_pipeline(
            src, "text", "doc_id", table, str(admitted), str(ckpt),
            min_quality=0.0, neardup_prefix=prefix, neardup_threshold=0.9,
        )
        q.awaitTermination()
        out = spark.read.parquet(str(admitted))
        ids = {r.doc_id for r in out.collect()}
        # 1: admitted (fresh); 2: admitted (fresh); 3: quality-gated;
        # 4: exact re-crawl of 1 -> digest-rejected;
        # 5: near-dup of 1 -> band-index-rejected
        assert ids == {1, 2}, ids
        # both indexes carry exactly the admitted docs
        assert {r.first_id for r in spark.table(table).collect()} == {1, 2}
        assert {r.doc_id for r in spark.table(f"{prefix}_sigs").select("doc_id").distinct().collect()} == {1, 2}
    finally:
        for t in (table, f"{prefix}_bands", f"{prefix}_sigs"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_pipeline_restart_resumes_with_both_indexes(spark, tmp_path):
    """Kill the pipeline after its first batch, land a second file
    containing an exact dup, a near-dup, and a fresh doc, restart on
    the same checkpoint: both persistent indexes (digest + band) carry
    over and reject their respective duplicate kinds."""
    from easydb_server_spark.streaming.ingest import stream_ingest_pipeline

    table = f"pipe_idx_{uuid.uuid4().hex[:8]}"
    prefix = f"pipe_mh_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"
    base = (
        "every morning the market opens with traders shouting numbers "
        "across the floor while screens flicker with prices from around the world"
    )
    near = " ".join(base.split()[1:])
    fresh = (
        "meanwhile in the quiet library a student turns pages slowly "
        "taking careful notes about the history of navigation and maps"
    )
    _write_docs(in_dir / "b0.json", [(1, base, "s")], order=0)

    def run():
        src = (
            spark.readStream.schema(_schema())
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = stream_ingest_pipeline(
            src, "text", "doc_id", table, str(admitted), str(ckpt),
            neardup_prefix=prefix, neardup_threshold=0.9,
        )
        q.awaitTermination()

    try:
        run()
        assert spark.read.parquet(str(admitted)).count() == 1
        _write_docs(in_dir / "b1.json", [(10, base, "s"), (11, near, "s"), (12, fresh, "s")], order=1)
        run()
        out = spark.read.parquet(str(admitted))
        ids = {r.doc_id for r in out.collect()}
        assert ids == {1, 12}, ids  # exact (10) and near (11) dups rejected
    finally:
        for t in (table, f"{prefix}_bands", f"{prefix}_sigs"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_pipeline_rejects_benchmark_contaminated_docs(spark, tmp_path):
    """Decontamination stage: a persisted benchmark digest table makes
    the pipeline reject any batch doc sharing a 3-shingle with the
    eval set, while clean docs are admitted — the streaming analogue
    of batch text_decontaminate."""
    from easydb_server_spark.streaming.ingest import (
        stream_ingest_pipeline,
        write_benchmark_digests,
    )

    table = f"pipe_idx_{uuid.uuid4().hex[:8]}"
    bench_table = f"pipe_bench_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"
    eval_text = "what is the capital of france and when was it founded"
    clean = (
        "a long treatise on the migration of birds across continents "
        "with careful notes about wind currents and seasonal timing"
    )
    # shares the 3-shingle "capital of france" with the eval set
    contaminated = "many quiz pages mention the capital of france in passing"
    bench = spark.createDataFrame([(999, eval_text)], "doc_id long, text string")
    write_benchmark_digests(bench, "text", "doc_id", bench_table)
    _write_docs(in_dir / "b0.json", [(1, clean, "s"), (2, contaminated, "s")], order=0)
    try:
        src = (
            spark.readStream.schema(_schema())
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = stream_ingest_pipeline(
            src, "text", "doc_id", table, str(admitted), str(ckpt),
            benchmark_digest_table=bench_table,
        )
        q.awaitTermination()
        ids = {r.doc_id for r in spark.read.parquet(str(admitted)).collect()}
        assert ids == {1}, ids
    finally:
        for t in (table, bench_table):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stream_export_shards_matches_batch_manifest(spark, tmp_path):
    """Streaming shard export across two micro-batches: the rolled-up
    manifest (SUM per shard over batches) equals the BATCH
    shard_manifest of the union, and every written row sits in the
    shard its hash dictates."""
    import pyspark.sql.functions as F

    from easydb_server_spark.operators.text import shard_manifest
    from easydb_server_spark.streaming.ingest import stream_export_shards

    in_dir, out, ckpt = tmp_path / "in", tmp_path / "shards", tmp_path / "ckpt"
    docs = [(i, f"doc number {i} with some text body {i * 7}") for i in range(40)]
    _write_docs(in_dir / "b0.json", [(i, t, "s") for i, t in docs[:20]], order=0)
    _write_docs(in_dir / "b1.json", [(i, t, "s") for i, t in docs[20:]], order=1)
    src = (
        spark.readStream.schema(_schema()).option("maxFilesPerTrigger", 1).json(str(in_dir))
    )
    q = stream_export_shards(src, "text", "doc_id", str(out), str(ckpt), n_shards=4)
    q.awaitTermination()

    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        r.shard: (r.n_docs, r.n_tokens, r.content_digest)
        for r in shard_manifest(batch_df, "text", "doc_id", n_shards=4).collect()
    }
    rolled = (
        spark.read.parquet(f"{out}/_manifest")
        .groupBy("shard")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("content_digest").alias("content_digest"),
        )
    )
    got = {r.shard: (r.n_docs, r.n_tokens, r.content_digest) for r in rolled.collect()}
    assert got == want
    rows = spark.read.json(str(out))
    assert rows.count() == 40
    # every written row sits in the shard the SHARED hash dictates —
    # recomputed here from the row's own id via _order_hash, so a
    # drifted copy of the hash in the exporter cannot stay green
    from easydb_server_spark.operators.text import _order_hash

    mismatch = rows.where(
        (_order_hash("id", "v1") % 4).cast("int") != F.col("shard")
    ).count()
    assert mismatch == 0
    # and the h column the loader orders by is the same hash
    assert rows.where(_order_hash("id", "v1") != F.col("h")).count() == 0


def test_stream_export_shards_restart_resumes_cleanly(spark, tmp_path):
    """Kill the export after batch 0, land a second file, restart on
    the same checkpoint: batch 1 is exported exactly once, nothing is
    duplicated, and the rolled-up manifest still equals the batch
    manifest of the union."""
    import pyspark.sql.functions as F

    from easydb_server_spark.operators.text import shard_manifest
    from easydb_server_spark.streaming.ingest import stream_export_shards

    in_dir, out, ckpt = tmp_path / "in", tmp_path / "shards", tmp_path / "ckpt"
    docs = [(i, f"restart corpus item {i} body {i * 13}") for i in range(30)]
    _write_docs(in_dir / "b0.json", [(i, t, "s") for i, t in docs[:15]], order=0)

    def run():
        src = (
            spark.readStream.schema(_schema())
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = stream_export_shards(src, "text", "doc_id", str(out), str(ckpt), n_shards=4)
        q.awaitTermination()

    run()
    assert spark.read.json(str(out)).count() == 15
    _write_docs(in_dir / "b1.json", [(i, t, "s") for i, t in docs[15:]], order=1)
    run()
    rows = spark.read.json(str(out))
    assert rows.count() == 30
    assert rows.select("id").distinct().count() == 30
    want = {
        r.shard: (r.n_docs, r.n_tokens, r.content_digest)
        for r in shard_manifest(
            spark.createDataFrame(docs, "doc_id long, text string"), "text", "doc_id", n_shards=4
        ).collect()
    }
    rolled = (
        spark.read.parquet(f"{out}/_manifest")
        .groupBy("shard")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("content_digest").alias("content_digest"),
        )
    )
    got = {r.shard: (r.n_docs, r.n_tokens, r.content_digest) for r in rolled.collect()}
    assert got == want


def test_pipeline_migrates_legacy_rowform_sigs_table(spark, tmp_path):
    """A `<prefix>_sigs` table persisted in the pre-array ROW form
    (doc_id, i, minhash, batch_id) must not just be readable — the
    pipeline also APPENDS each admitted batch's signatures, and parquet
    appends require the existing schema, so without a one-time rewrite
    the first admitted batch dies with AnalysisException (round-8
    ADVICE). Verify the migration end-to-end: run a batch to build the
    indexes, rewrite the sigs table to the legacy layout, then resume
    with a near-dup + a fresh doc — the near-dup is still rejected
    (read path), the fresh doc's signatures append cleanly (write
    path), and the table ends up array-form."""
    import pyspark.sql.functions as F

    from easydb_server_spark.streaming.ingest import stream_ingest_pipeline

    table = f"pipe_idx_{uuid.uuid4().hex[:8]}"
    prefix = f"pipe_mh_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"
    base = (
        "every morning the market opens with traders shouting numbers "
        "across the floor while screens flicker with prices from around the world"
    )
    near = " ".join(base.split()[1:])
    fresh = (
        "meanwhile in the quiet library a student turns pages slowly "
        "taking careful notes about the history of navigation and maps"
    )
    _write_docs(in_dir / "b0.json", [(1, base, "s")], order=0)

    def run():
        src = (
            spark.readStream.schema(_schema())
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = stream_ingest_pipeline(
            src, "text", "doc_id", table, str(admitted), str(ckpt),
            neardup_prefix=prefix, neardup_threshold=0.9,
        )
        q.awaitTermination()

    sigs_table = f"{prefix}_sigs"
    try:
        run()
        # devolve the persisted sigs to the legacy row layout
        legacy = (
            spark.table(sigs_table)
            .select("doc_id", F.posexplode("mins").alias("i", "minhash"), "batch_id")
            .localCheckpoint(eager=True)
        )
        legacy.write.bucketBy(16, "doc_id").sortBy("doc_id").mode("overwrite").format(
            "parquet"
        ).saveAsTable(sigs_table)
        assert "mins" not in spark.table(sigs_table).columns  # really legacy now

        _write_docs(in_dir / "b1.json", [(11, near, "s"), (12, fresh, "s")], order=1)
        run()  # would raise AnalysisException at the sigs append pre-fix
        ids = {r.doc_id for r in spark.read.parquet(str(admitted)).collect()}
        assert ids == {1, 12}, ids  # near-dup 11 rejected via migrated index
        # the rewrite happened in the stream's cloned session; this
        # session's relation cache is stale until refreshed (standard
        # Spark cross-session behavior, noted in the helper docstring)
        spark.catalog.refreshTable(sigs_table)
        t = spark.table(sigs_table)
        assert "mins" in t.columns
        assert {r.doc_id for r in t.select("doc_id").distinct().collect()} == {1, 12}
    finally:
        for t in (table, f"{prefix}_bands", sigs_table):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_migrate_sigs_table_is_noop_on_array_form(spark):
    """The migration helper rewrites legacy tables exactly once and is
    a metadata-only no-op on array-form tables (and missing ones)."""
    import pyspark.sql.functions as F

    from easydb_server_spark.operators.dedup import (
        migrate_sigs_table_to_arrays,
        minhash_sig_array,
    )

    t = f"mig_sigs_{uuid.uuid4().hex[:8]}"
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    try:
        assert migrate_sigs_table_to_arrays(spark, t) is False  # missing
        sig = minhash_sig_array(docs, "text", "doc_id")
        legacy = sig.select(
            "doc_id", F.posexplode("mins").alias("i", "minhash")
        ).withColumn("batch_id", F.lit(0))
        legacy.write.bucketBy(16, "doc_id").sortBy("doc_id").format("parquet").saveAsTable(t)
        assert migrate_sigs_table_to_arrays(spark, t) is True
        assert migrate_sigs_table_to_arrays(spark, t) is False  # already array
        got = spark.table(t).collect()
        want = sig.collect()
        assert len(got) == 1
        assert got[0].mins == want[0].mins and got[0].batch_id == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_pipeline_gates_match_batch_admit_list(spark, tmp_path):
    """r9 batch≡stream gate unification: the SAME corpus streamed in
    three micro-batches through the Gopher + persisted-unigram-LM
    gates admits EXACTLY the documents the batch operators admit —
    gopher_rules' pass_gopher, score_unigram_lm under the same frozen
    model, then first-appearance exact dedup. Pre-r9 the stream had no
    gopher/LM gates, so the two execution modes admitted different
    corpora from identical data."""
    import pyspark.sql.functions as F

    from easydb_server_spark.operators.text import (
        gopher_rules,
        score_unigram_lm,
        write_unigram_lm,
    )
    from easydb_server_spark.streaming.ingest import stream_ingest_pipeline

    table = f"gates_idx_{uuid.uuid4().hex[:8]}"
    lm_table = f"gates_lm_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"
    fluent = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away to the hills where it finds a quiet place to rest with a "
        "friend of the family that would have come along to be with it"
    )
    fluent2 = (
        "a completely different story about ships and tides is told with "
        "care by the old sailors who have crossed the open sea and that "
        "chart of the stars would be the way to find a road back home"
    )
    short = "too short to pass the word count"
    gibberish = " ".join(f"zz{i}qq" for i in range(60))  # OOV → low LM score
    dup = fluent  # exact re-crawl, later batch
    rows = [(1, fluent, "s"), (2, short, "s"), (3, fluent2, "s"), (4, gibberish, "s"), (5, dup, "s")]
    # frozen LM trained on the fluent half (the "seed corpus")
    seed = spark.createDataFrame([(1, fluent), (3, fluent2)], "doc_id long, text string")
    _write_docs(in_dir / "b0.json", rows[:2], order=0)
    _write_docs(in_dir / "b1.json", rows[2:4], order=1)
    _write_docs(in_dir / "b2.json", rows[4:], order=2)
    try:
        write_unigram_lm(seed, "text", "doc_id", lm_table, vocab_size=100)
        min_words, min_lp = 35, -3.0  # fluent docs have 38-40 words

        # batch-mode admit list over the same corpus with the same gates
        corpus = spark.createDataFrame(rows, "doc_id long, text string, source string")
        ok_g = (
            gopher_rules(corpus, "text", "doc_id", min_words=min_words, min_stopwords=1)
            .where(F.col("pass_gopher"))
            .select("doc_id")
        )
        ok_lm = (
            score_unigram_lm(corpus, "text", "doc_id", spark, lm_table)
            .where(F.col("mean_logprob") >= min_lp)
            .select("doc_id")
        )
        gated = corpus.join(ok_g, "doc_id", "left_semi").join(ok_lm, "doc_id", "left_semi")
        batch_admit = {
            r.doc_id
            for r in gated.withColumn("h", F.md5("text"))
            .groupBy("h")
            .agg(F.min("doc_id").alias("doc_id"))
            .collect()
        }

        src = (
            spark.readStream.schema(_schema())
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = stream_ingest_pipeline(
            src, "text", "doc_id", table, str(admitted), str(ckpt),
            gopher={"min_words": min_words, "min_stopwords": 1},
            lm_table=lm_table, min_mean_logprob=min_lp,
        )
        q.awaitTermination()
        stream_admit = {r.doc_id for r in spark.read.parquet(str(admitted)).collect()}
        assert stream_admit == batch_admit
        # sanity: the gates actually discriminated (some admitted, some not)
        assert {1, 3} <= batch_admit and 2 not in batch_admit and 4 not in batch_admit
    finally:
        for t in (table, lm_table, f"{lm_table}_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stream_embedding_ingest_dedup_and_replay(spark, tmp_path):
    """Continuous embedding ingest: batch 0 bootstraps the IVF store,
    later batches reject exact/near copies of stored vectors and
    within-batch twins, novel vectors are admitted and appended so the
    NEXT batch sees them; a crash-replayed batch recomputes the same
    admit list (seq < batch_id probe filter)."""
    import math

    from easydb_server_spark.streaming.ingest import stream_embedding_ingest

    store = f"emb_ing_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"

    def vec(theta):
        return [math.cos(theta), math.sin(theta)]

    def write_vecs(path, rows, order=0):
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(
            "".join(json.dumps({"vec_id": i, "v": v}) + "\n" for (i, v) in rows)
        )
        t = 1_700_000_000 + order * 60
        os.utime(path, (t, t))

    b0 = [(i, vec(i * math.pi / 10)) for i in range(10)]
    # batch 1: one exact copy of vec 3, one within-batch twin pair
    # (20/21), one novel direction
    b1 = [(20, vec(2.0)), (21, vec(2.0)), (30, vec(3 * math.pi / 10)), (40, vec(2.7))]
    # batch 2: near-copy of batch-1's admitted vec 20, plus novel
    b2 = [(50, vec(2.0 + 1e-6)), (60, vec(1.23))]
    write_vecs(in_dir / "b0.json", b0, order=0)
    write_vecs(in_dir / "b1.json", b1, order=1)
    write_vecs(in_dir / "b2.json", b2, order=2)
    schema = "vec_id long, v array<double>"
    try:
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = stream_embedding_ingest(
            src, "v", "vec_id", store, str(admitted), str(ckpt),
            threshold=0.9999, nprobe=2, n_cells=4,
        )
        q.awaitTermination()
        out = spark.read.parquet(str(admitted))
        ids = {r.qid for r in out.collect()}
        # batch 0 all admitted; 21 is a within-batch twin of 20;
        # 30 copies stored vec 3; 50 near-copies stored 20; 40/60 novel
        assert set(range(10)) <= ids
        assert 20 in ids and 40 in ids and 60 in ids
        assert 21 not in ids and 30 not in ids and 50 not in ids
        # the store holds exactly the admitted vectors
        store_ids = {r.cid for r in spark.table(store).select("cid").collect()}
        assert store_ids == ids
        # crash-replay of batch 0: a fresh query (new checkpoint)
        # reprocesses b0's content under the same batch_id=0 against
        # the fully-populated store — the state a mid-commit crash
        # leaves. The seq < 0 probe filter hides every stored row, so
        # the replay recomputes b0's exact admit list; its partition
        # overwrites (not duplicates), and the re-appended seq=0 rows
        # collapse at compaction.
        replay_dir = tmp_path / "replay"
        write_vecs(replay_dir / "b0.json", b0, order=0)
        src2 = spark.readStream.schema(schema).json(str(replay_dir))
        q2 = stream_embedding_ingest(
            src2, "v", "vec_id", store, str(admitted), str(tmp_path / "ckpt2"),
            threshold=0.9999, nprobe=2, n_cells=4,
        )
        q2.awaitTermination()
        out2 = spark.read.parquet(str(admitted))
        assert {r.qid for r in out2.collect()} == ids
        # the double-appended batch-0 rows disappear at compaction
        # (refresh: the append ran in the stream's cloned session, and
        # this session's relation cache predates it)
        from easydb_server_spark.operators.similarity import compact_ivf_store

        spark.catalog.refreshTable(store)
        assert spark.table(store).count() > len(ids)
        assert compact_ivf_store(spark, store) == len(ids)
    finally:
        for t in (store, f"{store}_centroids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_pipeline_c4_gate_matches_batch_admit_list(spark, tmp_path):
    """r10: the C4 page gate streams identically to batch — the SAME
    corpus micro-batched through c4=True admits exactly the documents
    whose pass_c4 holds in batch mode (delegation contract, same as
    the Gopher/LM gates)."""
    import pyspark.sql.functions as F

    from easydb_server_spark.operators.text import c4_rules
    from easydb_server_spark.streaming.ingest import stream_ingest_pipeline

    table = f"c4_idx_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"
    good = (
        "one fine sentence with enough words right here.\n"
        "another fine sentence with enough words follows!\n"
        "a third fine sentence with enough words closes it?"
    )
    good2 = good.replace("fine", "great")
    lorem = good + "\nlorem ipsum dolor sit amet padding."
    brace = good + "\ncode page { with a brace inside }."
    sparse = "no terminal punctuation at all here\nshort one."
    rows = [(1, good, "s"), (2, lorem, "s"), (3, sparse, "s"), (4, good2, "s"), (5, brace, "s")]
    _write_docs(in_dir / "b0.json", rows[:2], order=0)
    _write_docs(in_dir / "b1.json", rows[2:4], order=1)
    _write_docs(in_dir / "b2.json", rows[4:], order=2)
    try:
        corpus = spark.createDataFrame(rows, "doc_id long, text string, source string")
        batch_admit = {
            r.doc_id
            for r in c4_rules(corpus, "text", "doc_id")
            .where(F.col("pass_c4"))
            .collect()
        }
        src = (
            spark.readStream.schema(_schema())
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = stream_ingest_pipeline(
            src, "text", "doc_id", table, str(admitted), str(ckpt), c4=True
        )
        q.awaitTermination()
        stream_admit = {r.doc_id for r in spark.read.parquet(str(admitted)).collect()}
        assert stream_admit == batch_admit
        assert {1, 4} <= batch_admit and {2, 3, 5}.isdisjoint(batch_admit)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stream_crawl_ingest_matches_batch_crawl(spark, tmp_path):
    """r10: raw pages streamed through stream_crawl_ingest (URL gate →
    extraction → gopher gate → exact dedup) admit exactly the doc_ids
    the batch crawl composition admits on the same pages."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T_

    from easydb_server_spark.operators.text import (
        gopher_rules,
        html_extract,
        url_features,
    )
    from easydb_server_spark.streaming.ingest import stream_crawl_ingest

    table = f"crawl_idx_{uuid.uuid4().hex[:8]}"
    in_dir, admitted, ckpt = tmp_path / "in", tmp_path / "admitted", tmp_path / "ckpt"
    body = (
        "<h1>Title</h1><P>the quick brown fox jumps over the lazy dog and "
        "then runs far away to the hills where it rests with a friend of "
        "the family that would have come along to be with it</P>"
    )
    pages = [
        (1, "https://ok.example.com/a", f"<html><body>{body}</body></html>"),
        (2, "https://spamhost.bad/x", f"<html><body>{body}</body></html>"),   # domain-blocked
        (3, "https://ok.example.com/casino", f"<html><body>{body}</body></html>"),  # keyword
        (4, "https://other.example.com/b", f"<html><body>{body}</body></html>"),    # dup of 1's text
        (5, "https://ok.example.com/c", "<html><body><P>too short page</P></body></html>"),
    ]

    def write_pages(path, rows, order=0):
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(
            "".join(
                json.dumps({"doc_id": i, "url": u, "html": h}) + "\n"
                for (i, u, h) in rows
            )
        )
        t = 1_700_000_000 + order * 60
        os.utime(path, (t, t))

    write_pages(in_dir / "b0.json", pages[:2], order=0)
    write_pages(in_dir / "b1.json", pages[2:4], order=1)
    write_pages(in_dir / "b2.json", pages[4:], order=2)
    blocked = ("spamhost.bad",)
    kws = ("casino",)
    try:
        # batch-mode composition over the same pages
        corpus = spark.createDataFrame(pages, "doc_id long, url string, html string")
        ok = (
            url_features(corpus, "url", "doc_id", blocked, kws)
            .where(F.col("pass_url"))
            .select("doc_id")
        )
        extracted = html_extract(corpus.join(ok, "doc_id"), "html", "doc_id")
        gated = extracted.join(
            gopher_rules(extracted, "clean_text", "doc_id", min_words=30, min_stopwords=1)
            .where(F.col("pass_gopher"))
            .select("doc_id"),
            "doc_id",
            "left_semi",
        )
        batch_admit = {
            r.doc_id
            for r in gated.withColumn("h", F.md5("clean_text"))
            .groupBy("h")
            .agg(F.min("doc_id").alias("doc_id"))
            .collect()
        }
        schema = T_.StructType(
            [
                T_.StructField("doc_id", T_.LongType()),
                T_.StructField("url", T_.StringType()),
                T_.StructField("html", T_.StringType()),
            ]
        )
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = stream_crawl_ingest(
            src, "html", "url", "doc_id", table, str(admitted), str(ckpt),
            blocked_domains=blocked, blocked_keywords=kws,
            gopher={"min_words": 30, "min_stopwords": 1},
        )
        q.awaitTermination()
        stream_admit = {r.doc_id for r in spark.read.parquet(str(admitted)).collect()}
        assert stream_admit == batch_admit
        # the gates actually discriminated
        assert 1 in batch_admit and {2, 3, 5}.isdisjoint(batch_admit)
        assert 4 not in batch_admit  # exact dup of doc 1's extracted text
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
