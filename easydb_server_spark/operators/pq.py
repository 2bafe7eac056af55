"""Product quantization for embedding stores (Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search") — the memory side
of the ANN story the IVF index (operators/similarity.py) leaves open:
IVF prunes WHICH vectors a query scores; PQ shrinks WHAT each stored
vector costs. Splitting a d-dim vector into ``m`` subspaces and
quantizing each to one of ``k`` centroids stores ``m`` small codes
instead of d floats — m=4, k=16 over the 64-dim test embeddings is
4 codes vs 64 floats (64×), and the asymmetric-distance ranking never
reconstructs: scores are sums of ``m`` table lookups.

This implementation quantizes in INNER-PRODUCT space, matching the
repo's cosine/dot similarity stack end-to-end: the dot product
decomposes EXACTLY across subspaces (``dot(q, x̂) = Σⱼ dot(qⱼ, cⱼ)``
where x̂ is the reconstruction), so ADC scoring is not an extra
approximation on top of quantization — it IS the reconstructed dot.
Assignment uses the same rounded-dot-argmax + deterministic-seed
k-means as :func:`~easydb_server_spark.operators.similarity.
ivf_centroids` (init = the k vectors with the smallest md5(id) per
subspace; Lloyd update = per-position rounded mean; empty cells keep
their previous centroid), so a DuckDB oracle replays codebook,
codes, and every ADC score bit-for-bit.

Scale shape: training touches (sub, cid, subvec) rows — ``m`` narrow
rows per vector — through one broadcast join (the codebook is m·k
rows, KBs) and one (sub, cell, pos) mean shuffle per Lloyd iteration;
nothing wider than a subvector ever shuffles. Encoding is the same
broadcast-argmax, map-only after the explode. ADC fans the encoded
corpus to (id, sub, code) rows, joins the broadcast query LUT
(q·m·k rows), and partial-aggregates the per-(qid, id) sums
map-side — the corpus is scanned once per query batch and only
(qid, id, partial-sum) rows shuffle. Top-k lands in a per-qid window
over k-bounded rows, and the caller composes with IVF pruning when
the corpus is cell-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from easydb_server_spark.operators.similarity import _as_double, _dot


def _subvecs(df: DataFrame, vec_col: str, id_col: str, m: int, width: int) -> DataFrame:
    """(id, sub, svec): m subspace rows per vector."""
    return df.select(
        F.col(id_col).alias("cid"),
        _as_double(F.col(vec_col)).alias("vec"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
    ).select(
        "cid",
        "sub",
        F.slice(F.col("vec"), F.col("sub") * width + 1, width).alias("svec"),
    )


def _dim_width(df: DataFrame, vec_col: str, m: int) -> int:
    row = df.select(F.size(_as_double(F.col(vec_col))).alias("d")).first()
    if row is None:
        raise ValueError("cannot train PQ on an empty corpus")
    d = int(row["d"])
    if d % m:
        raise ValueError(f"vector dim {d} is not divisible by m={m} subspaces")
    return d // m


def _nearest_code(subs: DataFrame, codebook: DataFrame) -> DataFrame:
    """argmax rounded dot per (cid, sub); ties by code asc — the
    assignment rule shared by training, encoding, and the oracle."""
    sim = F.round(_dot(F.col("svec"), F.col("centroid")), 6)
    w = Window.partitionBy("cid", "sub").orderBy(F.col("sim").desc(), F.col("code"))
    return (
        subs.join(F.broadcast(codebook), "sub")
        .select("cid", "sub", "svec", "code", sim.alias("sim"))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("cid", "sub", "svec", "code")
    )


def pq_train(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    k: int = 16,
    n_iters: int = 1,
) -> DataFrame:
    """Train the PQ codebook → (sub, code, centroid) with codes
    0..k-1 per subspace. Deterministic: per-subspace init is the k
    subvectors whose parent ids have the smallest md5(id) (the
    ivf_centroids seeding, replayable by the SQL oracle), then
    ``n_iters`` Lloyd rounds of rounded-mean updates."""
    width = _dim_width(corpus, vec_col, m)
    subs = _subvecs(corpus, vec_col, id_col, m, width)
    wseed = Window.partitionBy("sub").orderBy(
        F.md5(F.col("cid").cast("string")), F.col("cid")
    )
    codebook = (
        subs.withColumn("r", F.row_number().over(wseed))
        .where(F.col("r") <= k)
        .select("sub", (F.col("r") - 1).cast("int").alias("code"), F.col("svec").alias("centroid"))
    )
    for _ in range(n_iters):
        assigned = _nearest_code(subs, codebook)
        upd = (
            assigned.select("sub", "code", F.posexplode("svec").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.round(F.avg("val"), 5).alias("mval"))
            .groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("pm"))
            .select("sub", "code", F.transform("pm", lambda s: s["mval"]).alias("centroid"))
        )
        codebook = (
            codebook.select("sub", "code", F.col("centroid").alias("prev"))
            .join(upd, ["sub", "code"], "left")
            .select("sub", "code", F.coalesce("centroid", "prev").alias("centroid"))
        )
    # the codebook feeds multiple broadcast branches (encode + every
    # LUT); materialize once, same rationale as ivf_centroids
    return codebook.localCheckpoint(eager=True)


def pq_encode(
    df: DataFrame, vec_col: str, id_col: str, codebook: DataFrame, m: int
) -> DataFrame:
    """Encode vectors → (id, codes array<int>, m codes in subspace
    order). Map-only after the subspace explode: broadcast argmax,
    then per-id reassembly."""
    width = _dim_width(df, vec_col, m)
    subs = _subvecs(df, vec_col, id_col, m, width)
    return (
        _nearest_code(subs, codebook)
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))), lambda s: s["code"]
            ).alias("codes")
        )
        .select(F.col("cid").alias(id_col), "codes")
    )


def pq_decode(encoded: DataFrame, codebook: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Reconstruct approximations → (id, vec): concatenate each
    code's centroid in subspace order. The reconstruction whose dot
    products ADC returns exactly."""
    return (
        encoded.select(F.col(id_col).alias("cid"), F.posexplode("codes").alias("sub", "code"))
        .join(F.broadcast(codebook), ["sub", "code"])
        .groupBy("cid")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "centroid"))),
                    lambda s: s["centroid"],
                )
            ).alias("vec")
        )
        .select(F.col("cid").alias(id_col), "vec")
    )


def pq_adc_topk(
    queries: DataFrame,
    encoded: DataFrame,
    codebook: DataFrame,
    vec_col: str,
    qid_col: str,
    id_col: str = "vec_id",
    m: int = 4,
    k_top: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Asymmetric-distance top-k: per query, score every encoded
    vector as the sum of m LUT lookups (``Σⱼ round(dot(qⱼ, c[codeⱼ]),
    6)``, the exact dot against the reconstruction) and keep the
    ``k_top`` best — (qid, cid, adc_score, rank), ties by cid. The LUT
    (queries × m × k rows) broadcasts; the encoded corpus streams once.

    ``exclude_self=True`` (the default, for the queries-are-corpus-
    rows case) drops candidates whose id equals the query id — it
    assumes queries and corpus SHARE an id space of the same type. For
    an EXTERNAL query batch pass ``exclude_self=False``: with separate
    id spaces a corpus vector whose id collides with a query id would
    be silently dropped, and a qid/cid type mismatch would null the
    predicate and drop every row.

    Determinism (the repo fixed-point discipline): each LUT partial is
    quantized to INT64 micro-units (``round(dot·1e6)``) BEFORE the
    per-(qid, cid) sum, so the m-way summation is exact integer
    arithmetic — order-free under any partitioning — and the score is
    one float division at the end. Quantization error ≤ m·5e-7,
    identical to the previous per-part ROUND(…,6)."""
    width = _dim_width(queries, vec_col, m)
    lut = (
        _subvecs(queries, vec_col, qid_col, m, width)
        .withColumnRenamed("cid", "qid")
        .join(F.broadcast(codebook), "sub")
        .select(
            "qid",
            "sub",
            "code",
            F.round(_dot(F.col("svec"), F.col("centroid")) * F.lit(1000000.0), 0)
            .cast("long")
            .alias("part_units"),
        )
    )
    fan = encoded.select(
        F.col(id_col).alias("cid"), F.posexplode("codes").alias("sub", "code")
    )
    scored = fan.join(F.broadcast(lut), ["sub", "code"])
    if exclude_self:
        scored = scored.where(F.col("cid") != F.col("qid"))
    scored = scored.groupBy("qid", "cid").agg(
        F.sum("part_units").alias("adc_units")
    )
    # k-bounded TWO-STAGE top-k (r11 verdict ask #6): a single
    # per-qid window holds a corpus-sized partition per query at
    # scale. Stage 1 ranks within (qid, salt) — each salt bucket sees
    # ~1/SALT of the candidates, and every global top-k row is
    # necessarily in its own bucket's top-k — stage 2 ranks the
    # <= SALT*k_top survivors per qid. The salt is a deterministic
    # hash of cid: it only routes rows, never affects values.
    nsalt = 32
    w1 = Window.partitionBy("qid", "salt").orderBy(
        F.col("adc_units").desc(), F.col("cid")
    )
    partial = (
        scored.withColumn("salt", F.pmod(F.hash(F.col("cid")), F.lit(nsalt)))
        .withColumn("prank", F.row_number().over(w1))
        .where(F.col("prank") <= k_top)
        .drop("salt", "prank")
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc_units").desc(), F.col("cid"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_top)
        .select(
            "qid",
            "cid",
            F.round(F.col("adc_units").cast("double") / F.lit(1000000.0), 6).alias(
                "adc_score"
            ),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivfpq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    k: int = 16,
    n_cells: int | None = None,
    nprobe: int = 2,
    k_top: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """IVFADC (Jégou 2011 §IV): the coarse IVF quantizer prunes WHICH
    vectors are scored, product quantization of the RESIDUALS shrinks
    WHAT each stored vector costs — the composition every large-scale
    ANN deployment runs (FAISS ``IVFx,PQy``), here in inner-product
    space where the decomposition is exact:

        dot(q, c_cell + r̂) = dot(q, c_cell) + Σⱼ dot(qⱼ, r̂ⱼ)

    so the score is one coarse dot per probed (query, cell) plus m
    residual-LUT lookups — and unlike the L2 formulation, the LUT is
    built on q ITSELF (not q−c), so one LUT per query serves every
    probed cell. Every term is quantized to INT64 micro-units before
    the sum (the fixed-point discipline), so ranking is order-free and
    a DuckDB oracle replays the whole derivation — coarse k-means,
    residuals, residual codebook, codes, LUT, scores — bit-for-bit.

    Scale shape: centroids broadcast (n_cells·d doubles); residual
    computation rides the assignment pass map-side; PQ training/encode
    shuffle only (sub, code, pos) rows; the search joins the encoded
    corpus's probed slice to the broadcast LUT and shuffles only
    (qid, cid, partial) rows. Nothing corpus-width ever moves.
    """
    from easydb_server_spark.operators.similarity import (
        _as_double,
        _assign_cells,
        ivf_centroids,
    )

    cents = ivf_centroids(corpus, vec_col, id_col, n_cells=n_cells, n_iters=1)
    vecs = corpus.select(
        F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("cvec")
    )
    assigned = _assign_cells(vecs, cents, id_col="cid", vec_col="cvec", top=1)
    resid = assigned.join(F.broadcast(cents), "cell").select(
        "cid",
        "cell",
        F.zip_with("cvec", "centroid", lambda a, b: a - b).alias("rvec"),
    )
    # the residual table feeds train + encode; pin it once (bounded:
    # one narrow row per corpus vector, same rationale as pq_train's
    # codebook checkpoint)
    resid = resid.localCheckpoint(eager=True)
    codebook = pq_train(resid, "rvec", "cid", m=m, k=k, n_iters=1)
    # encode WITHOUT the (assemble codes array -> re-join cell) round
    # trip pq_encode would take: the assignment window keeps cell as a
    # passthrough column, so the fan-out rows the search needs come
    # straight out of the argmax (same rule as _nearest_code — the
    # oracle replays it identically) and no corpus-width join appears
    # in the plan (the plan audit flagged a SortMergeJoin on cid in
    # the assembled-codes formulation).
    width = _dim_width(queries, vec_col, m)
    rsubs = resid.select(
        "cid",
        "cell",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "rvec",
    ).select(
        "cid",
        "cell",
        "sub",
        F.slice(F.col("rvec"), F.col("sub") * width + 1, width).alias("svec"),
    )
    rsim = F.round(_dot(F.col("svec"), F.col("centroid")), 6)
    wcode = Window.partitionBy("cid", "sub").orderBy(F.col("sim").desc(), F.col("code"))
    fan = (
        rsubs.join(F.broadcast(codebook), "sub")
        .select("cid", "cell", "sub", "code", rsim.alias("sim"))
        .withColumn("r", F.row_number().over(wcode))
        .where(F.col("r") == 1)
        .select("cid", "cell", "sub", "code")
    )

    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
    )
    probed = _assign_cells(q, cents, id_col="qid", vec_col="qvec", top=nprobe)
    coarse = probed.join(F.broadcast(cents), "cell").select(
        "qid",
        "cell",
        F.round(_dot(F.col("qvec"), F.col("centroid")) * F.lit(1000000.0), 0)
        .cast("long")
        .alias("coarse_units"),
    )
    lut = (
        _subvecs(q.select(F.col("qid").alias("cid"), F.col("qvec")), "qvec", "cid", m, width)
        .withColumnRenamed("cid", "qid")
        .join(F.broadcast(codebook), "sub")
        .select(
            "qid",
            "sub",
            "code",
            F.round(_dot(F.col("svec"), F.col("centroid")) * F.lit(1000000.0), 0)
            .cast("long")
            .alias("part_units"),
        )
    )
    cand = fan.join(F.broadcast(coarse), "cell").join(
        F.broadcast(lut), ["qid", "sub", "code"]
    )
    if exclude_self:
        cand = cand.where(F.col("cid") != F.col("qid"))
    scored = cand.groupBy("qid", "cid").agg(
        (F.min("coarse_units") + F.sum("part_units")).alias("adc_units")
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc_units").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_top)
        .select(
            "qid",
            "cid",
            F.round(F.col("adc_units").cast("double") / F.lit(1000000.0), 6).alias(
                "adc_score"
            ),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivfpq_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    k: int = 16,
    n_cells: int | None = None,
    nprobe: int = 2,
    k_candidates: int = 32,
    k_top: int = 5,
) -> DataFrame:
    """Two-stage retrieval (the standard serving composition FAISS
    deployments run on top of IVFPQ): the compressed index proposes
    ``k_candidates`` per query via :func:`ivfpq_adc_topk`, then the
    RAW vectors of just that bounded slice are fetched and re-ranked
    by their exact inner product — ADC recall at (almost) exact-search
    precision, paying full-vector reads for k_candidates rows per
    query instead of the corpus.

    Scale shape: stage 1 is the IVFADC plan (nothing corpus-width
    moves); stage 2 joins the k_candidates×|queries| candidate rows to
    the corpus vectors (hash join keyed on cid — the probed slice is
    the DRIVER of the join, so the corpus side prunes to matching
    keys) and broadcasts the query vectors; the re-rank window
    partitions by qid over ≤ k_candidates rows. Scores are the same
    INT64 micro-units the ADC stage uses, so the DuckDB oracle replays
    stage 2 with two joins and a window over the stage-1 chain.

    Output: (qid, cid, exact_score, adc_rank, rank) — adc_rank kept so
    a recall audit can see how far the exact winner sat in the ADC
    ordering.
    """
    cand = ivfpq_adc_topk(
        corpus, queries, vec_col, id_col,
        m=m, k=k, n_cells=n_cells, nprobe=nprobe, k_top=k_candidates,
    ).select("qid", "cid", F.col("rank").alias("adc_rank"))
    cvecs = corpus.select(
        F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("cvec")
    )
    qvecs = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
    )
    exact_units = (
        F.round(_dot(F.col("qvec"), F.col("cvec")) * F.lit(1000000.0), 0)
        .cast("long")
        .alias("exact_units")
    )
    scored = (
        cand.join(cvecs, "cid")
        .join(F.broadcast(qvecs), "qid")
        .select("qid", "cid", "adc_rank", exact_units)
    )
    w = Window.partitionBy("qid").orderBy(F.col("exact_units").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_top)
        .select(
            "qid",
            "cid",
            F.round(F.col("exact_units").cast("double") / F.lit(1000000.0), 6).alias(
                "exact_score"
            ),
            F.col("adc_rank").cast("int").alias("adc_rank"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --------------------------- PQ store lifecycle ---------------------------
#
# The persistent serving artifact for brute-ADC search — the PQ
# analogue of the IVF store (operators/similarity.py:write_ivf_store):
# codes are 100-500x narrower than raw vectors, so the store IS the
# memory win PQ exists for. Two tables:
#   <table>           (bucket, cid, codes array<int>, seq, cb_ver)
#                     partitioned by bucket = pmod(hash(cid), 16) for
#                     bounded per-file rewrite granularity
#   <table>_codebook  (sub, code, centroid, cb_ver, m, width)
# Appends encode against the FROZEN codebook and stamp its cb_ver;
# mixing code spaces is refused loudly (a retrained codebook without a
# re-encode would silently rank garbage). seq follows the IVF-store
# re-crawl semantics: newest copy of an id wins at compaction;
# replaying a crashed batch under the same seq stays idempotent.

# DEFAULT bucket count for new stores (conformance/test scale). The
# count a store was WRITTEN with is persisted in its codebook meta and
# re-read by every append — never trust a process-local constant for
# an existing store (a mismatch would scatter one cid over two
# partitions and break selective compaction's per-bucket newest-wins).
_PQ_STORE_BUCKETS = 16


def _drop_table_and_location(spark, name: str) -> None:
    """DROP TABLE IF EXISTS + remove the warehouse directory. A fresh
    session's in-memory catalog does not know tables a PREVIOUS
    session wrote, but the warehouse directory persists — overwrite
    saveAsTable then fails with LOCATION_ALREADY_EXISTS. The driver
    runs every conformance entry in its own vanilla session, so store
    writes must clear both the catalog entry and the orphaned path."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    jvm = spark.sparkContext._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{name.lower()}")
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def write_pq_store(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    table: str,
    m: int = 4,
    k: int = 16,
    n_iters: int = 1,
    n_buckets: int | None = None,
) -> None:
    """Train the codebook on ``corpus``, encode it, and persist both
    artifacts (overwrite). The codes table is the ONLY per-vector
    state — m small ints per vector — so a 100 TB float corpus
    serves from a ~1 TB store; raw vectors are never rescanned per
    query batch.

    ``n_buckets`` is FIXED for the store's lifetime and persisted in
    the codebook meta: every later append re-derives bucket = pmod(
    hash(cid), n_buckets) from the STORE, never from a process-local
    constant — if two writers disagreed, the same cid would land in
    two partitions and selective compaction's per-bucket newest-wins
    would silently keep both. Size it so bucket_size stays bounded at
    the target corpus (the SCALE.md pq-store sweep sizing rule)."""
    spark = corpus.sparkSession
    nb = int(n_buckets) if n_buckets else _PQ_STORE_BUCKETS
    _drop_table_and_location(spark, table)
    _drop_table_and_location(spark, f"{table}_codebook")
    width = _dim_width(corpus, vec_col, m)
    cb = pq_train(corpus, vec_col, id_col, m=m, k=k, n_iters=n_iters)
    enc = pq_encode(corpus, vec_col, id_col, cb, m=m)
    (
        enc.select(
            F.pmod(F.hash(F.col(id_col)), F.lit(nb)).alias("bucket"),
            F.col(id_col).alias("cid"),
            "codes",
            F.lit(0).cast("bigint").alias("seq"),
            F.lit(0).cast("bigint").alias("cb_ver"),
        )
        .write.partitionBy("bucket")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )
    (
        cb.select(
            "sub",
            "code",
            "centroid",
            F.lit(0).cast("bigint").alias("cb_ver"),
            F.lit(m).cast("int").alias("m"),
            F.lit(width).cast("int").alias("width"),
            F.lit(nb).cast("int").alias("n_buckets"),
        )
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{table}_codebook")
    )


def _store_codebook(spark, table: str):
    """(codebook df, cb_ver, m, width) of the CURRENT codebook."""
    cbt = spark.table(f"{table}_codebook")
    meta = cbt.select("cb_ver", "m", "width").limit(1).collect()
    if not meta:
        raise ValueError(f"store {table!r} has an empty codebook")
    ver, m, width = int(meta[0].cb_ver), int(meta[0].m), int(meta[0].width)
    return cbt.select("sub", "code", "centroid"), ver, m, width


def _store_n_buckets(spark, table: str) -> int:
    """The store's persisted bucket count (legacy stores without the
    meta column keep the module default they were written with)."""
    cbt = spark.table(f"{table}_codebook")
    if "n_buckets" not in cbt.columns:
        return _PQ_STORE_BUCKETS
    row = cbt.select("n_buckets").limit(1).collect()
    return int(row[0].n_buckets) if row else _PQ_STORE_BUCKETS


def _refuse_stale(spark, table: str, ver: int, action: str) -> None:
    stale = (
        spark.table(table)
        .where(F.col("cb_ver") != F.lit(ver))
        .limit(1)
        .count()
    )
    if stale:
        raise ValueError(
            f"store {table!r} holds codes from a different codebook version "
            f"than the current cb_ver={ver}; re-encode (rebuild_pq_store) "
            f"before {action} — mixing code spaces would rank garbage"
        )


def append_to_pq_store(
    spark,
    new_vectors: DataFrame,
    vec_col: str,
    id_col: str,
    table: str,
    seq: int | None = None,
) -> int:
    """Incremental ingest: encode the new batch against the store's
    FROZEN codebook and append. Refuses a store whose codes were
    written under a different codebook version (stale-codebook
    refusal). Returns appended row count. ``seq`` defaults to
    1 + current max; streaming callers pass their micro-batch id so
    crash replays collapse at compaction (the IVF-store contract)."""
    _recover_pq_compact(spark, table)
    cb, ver, m, _w = _store_codebook(spark, table)
    _refuse_stale(spark, table, ver, "appending")
    nxt = (
        seq
        if seq is not None
        else spark.table(table)
        .agg(F.coalesce(F.max("seq") + 1, F.lit(0)).alias("s"))
        .collect()[0]["s"]
    )
    nb = _store_n_buckets(spark, table)  # the STORE's bucket count, never a local constant
    enc = (
        pq_encode(new_vectors, vec_col, id_col, cb, m=m)
        .select(
            F.pmod(F.hash(F.col(id_col)), F.lit(nb)).alias("bucket"),
            F.col(id_col).alias("cid"),
            "codes",
            F.lit(nxt).cast("bigint").alias("seq"),
            F.lit(ver).cast("bigint").alias("cb_ver"),
        )
        .localCheckpoint(eager=True)
    )
    enc.write.partitionBy("bucket").mode("append").format("parquet").saveAsTable(table)
    return enc.count()


def _bucket_file_counts(spark, table: str) -> dict[int, int]:
    """Data-file count per ``bucket=N`` partition directory of a
    managed table — the append-growth signal selective compaction
    resets. FS listing only; no data read."""
    jvm = spark.sparkContext._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    root = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{table.lower()}")
    fs = root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out: dict[int, int] = {}
    if not fs.exists(root):
        return out
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("bucket=")):
            continue
        n = sum(
            1
            for f in fs.listStatus(st.getPath())
            if f.isFile() and not f.getPath().getName().startswith("_")
        )
        out[int(name.split("=", 1)[1])] = n
    return out


def _recover_pq_compact(spark, table: str) -> None:
    """Finish an interrupted SELECTIVE compaction: if the committed
    staged table exists, the dirty-bucket contents it holds are the
    one true post-compaction state of those partitions — replay the
    dynamic-partition overwrite (idempotent: same partitions, same
    rows) and drop it. Every store entry point (append / compact /
    serve) calls this first, so a crash between the staged commit and
    the partition overwrite can never be followed by an append whose
    rows the replay would erase."""
    staged = f"{table}__compact_staged"
    if not spark.catalog.tableExists(staged):
        return
    if spark.catalog.tableExists(table):
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            spark.table(staged).select(*spark.table(table).columns).write.insertInto(
                table, overwrite=True
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.sql(f"DROP TABLE {staged}")


def compact_pq_store(spark, table: str, files_per_bucket_cap: int = 8) -> int:
    """One row per vector id (newest ``seq`` wins — re-crawl update
    semantics) with the rewrite bounded by the DIRTY slice, not the
    store: only bucket partitions that hold a superseded row (a
    re-crawled cid) or whose data-file count exceeded
    ``files_per_bucket_cap`` (append growth) are rewritten, via
    dynamic-partition overwrite; clean buckets' bytes are never
    touched. A store that took only fresh-id appends compacts by
    rewriting nothing beyond file coalescing, so compaction cost
    tracks the re-crawl footprint — at 100 TB that is the difference
    between a nightly maintenance job and a full index rebuild.

    Crash-safe: the compacted dirty-bucket rows commit to
    ``<table>__compact_staged`` BEFORE any live partition is replaced;
    a crash mid-overwrite leaves the staged copy, and every store
    entry point replays it via :func:`_recover_pq_compact` (the
    overwrite is idempotent per partition). Returns the total
    surviving row count of the store."""
    from easydb_server_spark.operators.dedup import _recover_staged

    _recover_staged(spark, table)  # legacy full-swap crashes
    _recover_pq_compact(spark, table)
    t = spark.table(table)
    dup_buckets = {
        r.bucket
        for r in t.groupBy("bucket", "cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("bucket")
        .distinct()
        .collect()
    }
    grown = {
        b for b, n in _bucket_file_counts(spark, table).items() if n > files_per_bucket_cap
    }
    dirty = sorted(dup_buckets | grown)
    if not dirty:
        return t.count()
    w = Window.partitionBy("cid").orderBy(F.col("seq").desc())
    keep = (
        t.where(F.col("bucket").isin(dirty))
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .drop("_r")
        .select(*t.columns)
    )
    staged = f"{table}__compact_staged"
    spark.sql(f"DROP TABLE IF EXISTS {staged}")
    keep.repartition("bucket").write.partitionBy("bucket").mode("overwrite").format(
        "parquet"
    ).saveAsTable(staged)
    _recover_pq_compact(spark, table)  # performs the overwrite + drops staged
    return spark.table(table).count()


def pq_store_adc_topk(
    spark,
    queries: DataFrame,
    vec_col: str,
    qid_col: str,
    table: str,
    k_top: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Serve brute-ADC top-k from a persisted store: broadcast-LUT
    against the stored codebook, stream the codes table once, same
    INT64 micro-unit ranking as :func:`pq_adc_topk`. Refuses a store
    with mixed codebook versions."""
    _recover_pq_compact(spark, table)
    cb, ver, m, _w = _store_codebook(spark, table)
    _refuse_stale(spark, table, ver, "serving")
    enc = spark.table(table).select("cid", "codes")
    return pq_adc_topk(
        queries,
        enc,
        cb,
        vec_col,
        qid_col,
        id_col="cid",
        m=m,
        k_top=k_top,
        exclude_self=exclude_self,
    )


def rebuild_pq_store(
    spark,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    table: str,
    m: int = 4,
    k: int = 16,
    n_iters: int = 1,
) -> None:
    """Retrain + re-encode (the fix for stale-codebook refusal and
    for corpus drift): new codebook under cb_ver = old + 1, full
    overwrite of both tables. The store's persisted bucket count is
    carried over (the full rewrite is the one safe point to change it,
    but resharding is a separate decision from retraining)."""
    try:
        _cb, old_ver, _m, _w = _store_codebook(spark, table)
        nb = _store_n_buckets(spark, table)
    except Exception:
        old_ver, nb = -1, _PQ_STORE_BUCKETS
    _drop_table_and_location(spark, table)
    _drop_table_and_location(spark, f"{table}_codebook")
    width = _dim_width(corpus, vec_col, m)
    cb = pq_train(corpus, vec_col, id_col, m=m, k=k, n_iters=n_iters)
    enc = pq_encode(corpus, vec_col, id_col, cb, m=m)
    ver = old_ver + 1
    (
        enc.select(
            F.pmod(F.hash(F.col(id_col)), F.lit(nb)).alias("bucket"),
            F.col(id_col).alias("cid"),
            "codes",
            F.lit(0).cast("bigint").alias("seq"),
            F.lit(ver).cast("bigint").alias("cb_ver"),
        )
        .write.partitionBy("bucket")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )
    (
        cb.select(
            "sub",
            "code",
            "centroid",
            F.lit(ver).cast("bigint").alias("cb_ver"),
            F.lit(m).cast("int").alias("m"),
            F.lit(width).cast("int").alias("width"),
            F.lit(nb).cast("int").alias("n_buckets"),
        )
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{table}_codebook")
    )


def ivfpq_recall(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k_top: int = 5,
    m: int = 4,
    k: int = 16,
    n_cells: int | None = None,
    nprobe: int = 2,
) -> DataFrame:
    """Recall@k of IVFADC against EXACT search — the measurement the
    two-layer approximation (coarse pruning × residual quantization)
    is tuned by, as a first-class oracled operator (the PQ analogue of
    :func:`~easydb_server_spark.operators.similarity.ann_recall`,
    which only grades the IVF layer). Per query:
    |ivfpq_topk ∩ exact_topk| / k. Both sides are deterministic
    (rounded cosines / INT64 micro-unit ADC, id tie-breaks), so the
    recall of a given geometry is a replayable fact, not a hand-waved
    sweep number.

    Scale shape: the exact side is the broadcast-query brute scan —
    run this on a SAMPLED query set (dozens of rows), as every ANN
    deployment does; the IVFADC side probes as in production."""
    from easydb_server_spark.functions.exactround import round_ratio
    from easydb_server_spark.operators.similarity import topk_cosine_bruteforce

    exact = topk_cosine_bruteforce(corpus, queries, vec_col, id_col, k_top)
    approx = ivfpq_adc_topk(
        corpus,
        queries,
        vec_col,
        id_col,
        m=m,
        k=k,
        n_cells=n_cells,
        nprobe=nprobe,
        k_top=k_top,
    )
    hits = (
        exact.join(approx.select("qid", "cid"), ["qid", "cid"], "leftsemi")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    qids = exact.select("qid").distinct()
    return qids.join(hits, "qid", "left").select(
        "qid",
        F.lit(k_top).cast("int").alias("k"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
        round_ratio(F.coalesce(F.col("n_hits"), F.lit(0)), F.lit(k_top), 6).alias(
            "recall"
        ),
    )


def pq_store_stats(spark, table: str, compact_threshold: float = 0.2) -> dict:
    """Store health + the documented COMPACTION TRIGGER: appends are
    append-only, so a re-crawled id leaves its superseded copy serving
    alongside the newest until compaction — every superseded row is a
    wasted LUT-join probe at serve time. Returns ``{"n_rows",
    "n_ids", "n_superseded", "superseded_frac", "n_batches",
    "cb_ver", "needs_compaction"}``; compact when superseded_frac
    crosses the dial (default 20%). The codebook-drift question (is
    the FROZEN codebook still a good fit for what appends brought in?)
    is answered by :func:`ivfpq_recall` against a sampled query set —
    recall decay, not bucket shape, is PQ's retrain signal, since the
    hash buckets here are uniform by construction."""
    t = spark.table(table)
    row = t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("cid").alias("n_ids"),
        F.countDistinct("seq").alias("n_batches"),
        F.max("cb_ver").alias("cb_ver"),
    ).collect()[0]
    n_rows, n_ids = int(row.n_rows), int(row.n_ids)
    superseded = n_rows - n_ids
    frac = superseded / n_rows if n_rows else 0.0
    return {
        "n_rows": n_rows,
        "n_ids": n_ids,
        "n_superseded": superseded,
        "superseded_frac": round(frac, 6),
        "n_batches": int(row.n_batches),
        "cb_ver": int(row.cb_ver) if row.cb_ver is not None else 0,
        "needs_compaction": frac >= compact_threshold,
    }
