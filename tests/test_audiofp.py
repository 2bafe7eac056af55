"""Spectral-peak audio fingerprinting (operators/audiofp.py).

The conformance entry (dedup_audio_fingerprint) pins the closed-form
fixture against the DuckDB replay; these tests pin the operator
properties the fixture relies on — gain invariance, discrimination,
short-clip padding — and the dup-group stage's one-shuffle plan.
"""

from __future__ import annotations

import numpy as np


def _tone_clip(bins, amp=8000.0, frame=64):
    j = np.arange(frame, dtype=np.float64)
    segs = [np.round(amp * np.sin(2.0 * np.pi * b * j / frame)) for b in bins]
    return np.concatenate(segs).astype(np.int16)


def test_peak_sequence_matches_tone_bins():
    from easydb_server_spark.operators.audiofp import peak_sequence

    assert peak_sequence(_tone_clip([3, 17, 9, 30]), 64, 64) == [3, 17, 9, 30]


def test_fingerprint_is_gain_invariant_but_content_sensitive():
    """Same tones at 4x the level -> identical peaks; one segment's
    tone changed -> different sequence. Argmax is invariant to any
    positive gain, which is the whole point of spectral dedup."""
    from easydb_server_spark.operators.audiofp import peak_sequence

    a = peak_sequence(_tone_clip([5, 12, 25, 8], amp=2000.0), 64, 64)
    b = peak_sequence(_tone_clip([5, 12, 25, 8], amp=8000.0), 64, 64)
    c = peak_sequence(_tone_clip([5, 12, 26, 8], amp=2000.0), 64, 64)
    assert a == b == [5, 12, 25, 8]
    assert c != a


def test_short_clip_pads_to_one_frame():
    from easydb_server_spark.operators.audiofp import peak_sequence

    short = _tone_clip([7])[:40]  # shorter than one frame
    assert len(peak_sequence(short, 64, 64)) == 1


def test_audio_fingerprint_roundtrip_through_wav(spark):
    """Arrow stage == pure function through a REAL WAV encode/decode;
    two gain-varied copies share the fingerprint, a third clip with
    different content does not."""
    import hashlib

    from easydb_server_spark.operators.audiofp import audio_fingerprint
    from easydb_server_spark.operators.wav import encode_wav

    clips = {
        1: _tone_clip([4, 9, 14, 19], amp=3000.0),
        2: _tone_clip([4, 9, 14, 19], amp=11000.0),
        3: _tone_clip([4, 9, 14, 20], amp=3000.0),
    }
    df = spark.createDataFrame(
        [(i, bytearray(encode_wav(s, 8000))) for i, s in clips.items()],
        "item_id BIGINT, payload BINARY",
    )
    got = {
        r["item_id"]: (r["n_frames"], r["peak_seq"], r["fp"])
        for r in audio_fingerprint(df, "payload", "item_id").collect()
    }
    want_seq = "4-9-14-19"
    want_fp = hashlib.md5(want_seq.encode()).hexdigest()
    assert got[1] == (4, want_seq, want_fp)
    assert got[2] == (4, want_seq, want_fp)  # gain-invariant
    assert got[3][1] == "4-9-14-20" and got[3][2] != want_fp


def test_dup_groups_plan_is_one_keyed_window(spark):
    """fingerprint_dup_groups is ONE keyed shuffle (window partitioned
    by fp) — no join, no second exchange."""
    from easydb_server_spark.operators.audiofp import fingerprint_dup_groups

    sigs = spark.createDataFrame(
        [(i, 4, "s", f"fp{i % 3}") for i in range(9)],
        "item_id BIGINT, n_frames INT, peak_seq STRING, fp STRING",
    )
    out = fingerprint_dup_groups(sigs)
    # read the plan BEFORE executing: after collect(), AQE's toString
    # appends the "== Initial Plan ==" section and double-counts
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    rows = {r["item_id"]: (r["group_size"], r["is_canonical"]) for r in out.collect()}
    assert rows[0] == (3, True) and rows[3] == (3, False)


def _sig_frame(spark, rows):
    """rows: (item_id, peak_seq string) -> the audio_fingerprint shape
    the landmark operators consume."""
    return spark.createDataFrame(
        [(i, len(s.split("-")), s, "") for i, s in rows],
        "item_id BIGINT, n_frames INT, peak_seq STRING, fp STRING",
    )


def test_audio_landmarks_encoding_and_fanout(spark):
    """Known 4-peak sequence: fanout=3 yields the 6 (anchor, target,
    delta) triples, each encoded a*2^20 + t*2^10 + d."""
    from easydb_server_spark.operators.audiofp import audio_landmarks

    sigs = _sig_frame(spark, [(1, "5-9-2-7")])
    got = {r["lm"] for r in audio_landmarks(sigs, fanout=3).collect()}
    enc = lambda a, t, d: a * (1 << 20) + t * (1 << 10) + d  # noqa: E731
    want = {
        enc(5, 9, 1), enc(5, 2, 2), enc(5, 7, 3),
        enc(9, 2, 1), enc(9, 7, 2), enc(2, 7, 1),
    }
    assert got == want


def test_audio_landmarks_are_shift_robust(spark):
    """THE property the exact-sequence fp lacks: a copy padded with
    leading silence frames (peak 0) keeps every original landmark —
    its landmark set is a superset of the source's — while the md5
    fingerprint of the shifted sequence differs."""
    from easydb_server_spark.operators.audiofp import audio_landmarks

    sigs = _sig_frame(spark, [(1, "5-9-2-7"), (2, "0-0-5-9-2-7")])
    by_item = {}
    for r in audio_landmarks(sigs, fanout=3).collect():
        by_item.setdefault(r["item_id"], set()).add(r["lm"])
    assert by_item[1] <= by_item[2]


def test_landmark_matches_threshold_and_stop_cap(spark):
    """Three clips: 1 and 2 share 3 landmarks (match at min_shared=3);
    3 shares only the hot landmark every clip has — with max_bucket=2
    the hot landmark is stopped, so 3 matches nothing and 1-2 still
    match on their clean triples."""
    from easydb_server_spark.operators.audiofp import landmark_matches

    rows = [
        (1, 100), (1, 200), (1, 300), (1, 999),
        (2, 100), (2, 200), (2, 300), (2, 999),
        (3, 999), (3, 400), (3, 500),
    ]
    lms = spark.createDataFrame(rows, "item_id BIGINT, lm BIGINT")
    got = {
        (r["item_a"], r["item_b"]): r["shared"]
        for r in landmark_matches(lms, min_shared=3, max_bucket=2).collect()
    }
    assert got == {(1, 2): 3}
    # without the cap, the hot landmark counts and 1-2 share 4
    uncapped = {
        (r["item_a"], r["item_b"]): r["shared"]
        for r in landmark_matches(lms, min_shared=3, max_bucket=None).collect()
    }
    assert uncapped == {(1, 2): 4}


def test_audio_landmarks_plan_is_one_keyed_window(spark):
    """Landmark extraction shuffles once (the per-item window) plus
    the distinct's exchange over (item_id, lm) — never a join."""
    from easydb_server_spark.operators.audiofp import audio_landmarks

    sigs = _sig_frame(spark, [(1, "5-9-2-7"), (2, "1-2-3")])
    plan = (
        audio_landmarks(sigs, fanout=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_landmark_search_votes_and_offset(spark):
    """Offset voting: a query that is the index clip shifted by 2
    frames lands all its landmark votes on offset -2 and wins; a
    query sharing landmarks at INCONSISTENT offsets never concentrates
    min_votes on one cell."""
    from easydb_server_spark.operators.audiofp import (
        audio_landmarks_timed,
        landmark_search,
    )

    sigs = _sig_frame(
        spark,
        [
            (1, "5-9-2-7"),        # index clip
            (10, "0-0-5-9-2-7"),   # query: same clip padded 2 frames
            (11, "9-5-2-30-7"),    # query: shares peaks, scrambled order
        ],
    )
    lms = audio_landmarks_timed(sigs, fanout=3)
    got = {
        r["query_id"]: (r["match_id"], r["offset"], r["votes"])
        for r in landmark_search(
            lms.where("item_id < 10"), lms.where("item_id >= 10"), min_votes=3
        ).collect()
    }
    assert got[10] == (1, -2, 6)
    assert 11 not in got


def test_landmark_search_tiebreak_smallest_match_then_offset(spark):
    """Two identical index clips tie on votes; the winner is the
    smaller match_id (then smaller offset) — deterministic on both
    engines."""
    from easydb_server_spark.operators.audiofp import (
        audio_landmarks_timed,
        landmark_search,
    )

    sigs = _sig_frame(spark, [(3, "5-9-2-7"), (2, "5-9-2-7"), (10, "5-9-2-7")])
    lms = audio_landmarks_timed(sigs, fanout=3)
    [row] = landmark_search(
        lms.where("item_id < 10"), lms.where("item_id >= 10"), min_votes=3
    ).collect()
    assert (row["match_id"], row["offset"], row["votes"]) == (2, 0, 6)


def test_landmark_search_stop_cap_filters_index_side(spark):
    """max_bucket counts DISTINCT INDEX CLIPS per landmark: a landmark
    in 3 index clips is dropped at cap 2, so a query matching only
    through it finds nothing."""
    from easydb_server_spark.operators.audiofp import landmark_search

    idx = spark.createDataFrame(
        [(1, 0, 777), (2, 0, 777), (3, 0, 777),
         (1, 1, 111), (1, 2, 112), (1, 3, 113)],
        "item_id BIGINT, t INT, lm BIGINT",
    )
    qry = spark.createDataFrame(
        [(10, 0, 777), (10, 1, 777), (10, 2, 777)],
        "item_id BIGINT, t INT, lm BIGINT",
    )
    capped = landmark_search(idx, qry, min_votes=1, max_bucket=2).collect()
    assert capped == []
    uncapped = landmark_search(idx, qry, min_votes=1, max_bucket=None).collect()
    assert len(uncapped) == 1


def test_audio_landmarks_peak_overflow_raises(spark):
    """r15 ADVICE: a peak bin >= 2^peak_bits would silently overflow
    the target field into the anchor field (colliding landmarks) —
    the packing contract is now enforced at runtime on the data path."""
    import pytest

    from easydb_server_spark.operators.audiofp import (
        audio_landmarks,
        audio_landmarks_timed,
    )

    sigs = _sig_frame(spark, [(1, "5-1024-2")])
    with pytest.raises(Exception, match="overflows the landmark target field"):
        audio_landmarks(sigs, fanout=2).collect()
    with pytest.raises(Exception, match="overflows the landmark target field"):
        audio_landmarks_timed(sigs, fanout=2).collect()
    # one bit wider and the same sequence encodes cleanly
    assert audio_landmarks(sigs, fanout=2, peak_bits=11).count() == 3


def test_audio_landmarks_peak_bits_widens_fields(spark):
    """peak_bits=12 packs a*2^22 + t*2^10 + d: bins past 1023 (frame
    >= 2048, or a hashed-cell layout) stay collision-free, and the
    default layout is bit-identical to the r15 encoding."""
    from easydb_server_spark.operators.audiofp import audio_landmarks

    sigs = _sig_frame(spark, [(1, "1500-2000")])
    got = {r["lm"] for r in audio_landmarks(sigs, fanout=1, peak_bits=12).collect()}
    assert got == {1500 * (1 << 22) + 2000 * (1 << 10) + 1}


def test_audio_landmarks_parameter_validation(spark):
    """fanout is bounded by the 10-bit delta field; peak_bits by INT64
    headroom — both rejected eagerly, not at job time."""
    import pytest

    from easydb_server_spark.operators.audiofp import (
        audio_landmarks,
        audio_landmarks_timed,
    )

    sigs = _sig_frame(spark, [(1, "5-9")])
    for bad in ({"fanout": 0}, {"fanout": 1024}, {"peak_bits": 0}, {"peak_bits": 27}):
        with pytest.raises(ValueError):
            audio_landmarks(sigs, **bad)
        with pytest.raises(ValueError):
            audio_landmarks_timed(sigs, **bad)


def test_landmark_search_topk_ranks_distinct_matches(spark):
    """Top-k generalization: each match appears ONCE (its best cell by
    votes DESC then smaller offset), matches rank per query by
    (votes DESC, match_id), k truncates — and k=1 picks exactly
    landmark_search's winner (the global (votes, match_id, offset)
    cell order factors through the per-match reduction)."""
    import pytest

    from easydb_server_spark.operators.audiofp import (
        landmark_search,
        landmark_search_topk,
    )

    # index clip 1 shares 3 landmarks with the query at offset 2 AND
    # 3 landmarks at offset 5 (two cells, one match); clip 2 shares 4
    # at offset 0; clip 3 shares 3 at offset 1; clip 4 only 2 (below
    # min_votes)
    idx = spark.createDataFrame(
        [(1, t + 2, 100 + t) for t in range(3)]
        + [(1, t + 5, 200 + t) for t in range(3)]
        + [(2, t, 100 + t) for t in range(3)] + [(2, 3, 203)]
        + [(3, t + 1, 100 + t) for t in range(3)]
        + [(4, t, 300 + t) for t in range(2)],
        "item_id BIGINT, t INT, lm BIGINT",
    )
    qry = spark.createDataFrame(
        [(10, t, 100 + t) for t in range(3)]
        + [(10, t, 200 + t) for t in range(3)]
        + [(10, 3, 203)] + [(10, t, 300 + t) for t in range(2)],
        "item_id BIGINT, t INT, lm BIGINT",
    )
    got = [
        (r["match_id"], r["offset"], r["votes"], r["rank"])
        for r in landmark_search_topk(idx, qry, k=3, min_votes=3)
        .orderBy("rank").collect()
    ]
    # clip 2: 4 votes at offset 0 (landmarks 100-102 at t-offset 0 and
    # 203 at 0); clip 1: two 3-vote cells, best = smaller offset 2;
    # clip 3: 3 votes at offset 1; clip 4 never reaches min_votes
    assert got == [(2, 0, 4, 1), (1, 2, 3, 2), (3, 1, 3, 3)]
    # k truncates
    assert landmark_search_topk(idx, qry, k=2, min_votes=3).count() == 2
    # k=1 == landmark_search, row for row
    top1 = {
        (r["query_id"], r["match_id"], r["offset"], r["votes"])
        for r in landmark_search(idx, qry, min_votes=3).collect()
    }
    k1 = {
        (r["query_id"], r["match_id"], r["offset"], r["votes"])
        for r in landmark_search_topk(idx, qry, k=1, min_votes=3).collect()
    }
    assert top1 == k1
    with pytest.raises(ValueError):
        landmark_search_topk(idx, qry, k=0)


def _toy_lms(spark, rows):
    return spark.createDataFrame(rows, "item_id BIGINT, t INT, lm BIGINT")


def test_landmark_index_lifecycle_write_probe_append_compact(spark):
    """The durable landmark-index path (write -> probe -> append ->
    compact): results equal the inline-DataFrame path at every step,
    the probe never rescans any blob source (only the bucketed table
    and the batch appear in the plan), and compaction drops
    replay-duplicated rows without changing results."""
    import contextlib
    import io
    import shutil

    from easydb_server_spark.operators.audiofp import (
        append_landmark_index,
        compact_landmark_index,
        incremental_landmark_admit,
        write_landmark_index,
    )

    spark.sql("DROP TABLE IF EXISTS lm_index_t")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    shutil.rmtree(f"{wh}/lm_index_t", ignore_errors=True)
    # corpus clip 1: landmarks at t 0..3; clip 2 disjoint
    corpus = _toy_lms(
        spark,
        [(1, t, 100 + t) for t in range(4)] + [(2, t, 500 + t) for t in range(4)],
    )
    write_landmark_index(corpus, "lm_index_t", n_buckets=4)
    # batch: 10 = clip 1 shifted (rejected), 11 = novel, 12 = in-batch
    # duplicate of 11
    batch = _toy_lms(
        spark,
        [(10, t + 2, 100 + t) for t in range(4)]
        + [(11, t, 900 + t) for t in range(4)]
        + [(12, t, 900 + t) for t in range(4)],
    )
    out = incremental_landmark_admit(spark.table("lm_index_t"), batch, min_votes=3)
    got = {r["item_id"]: (r["corpus_match"], r["batch_match"], r["admitted"])
           for r in out.collect()}
    assert got == {10: (1, None, False), 11: (None, None, True), 12: (None, 11, False)}
    # inline path agrees
    inline = {
        r["item_id"]: (r["corpus_match"], r["batch_match"], r["admitted"])
        for r in incremental_landmark_admit(corpus, batch, min_votes=3).collect()
    }
    assert inline == got
    # probe plan reads the bucketed table; no other parquet source
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        incremental_landmark_admit(spark.table("lm_index_t"), batch).explain("formatted")
    plan = buf.getvalue()
    assert "lm_index_t" in plan
    assert "documents.parquet" not in plan and "Scan parquet  \n" not in plan
    # append the admitted item's landmarks, then the same item probes
    # as a corpus duplicate
    append_landmark_index(batch.where("item_id = 11"), "lm_index_t", n_buckets=4)
    reprobe = incremental_landmark_admit(
        spark.table("lm_index_t"),
        _toy_lms(spark, [(20, t + 1, 900 + t) for t in range(4)]),
        min_votes=3,
    ).collect()
    assert [(r["item_id"], r["corpus_match"], r["admitted"]) for r in reprobe] == [
        (20, 11, False)
    ]
    # replay the append (duplicated rows), compact, results unchanged
    append_landmark_index(batch.where("item_id = 11"), "lm_index_t", n_buckets=4)
    before = spark.table("lm_index_t").count()
    kept = compact_landmark_index(spark, "lm_index_t", n_buckets=4)
    assert kept == before - 4  # the 4 replayed rows dropped
    reprobe2 = incremental_landmark_admit(
        spark.table("lm_index_t"),
        _toy_lms(spark, [(20, t + 1, 900 + t) for t in range(4)]),
        min_votes=3,
    ).collect()
    assert [(r["item_id"], r["corpus_match"], r["admitted"]) for r in reprobe2] == [
        (20, 11, False)
    ]
    spark.sql("DROP TABLE IF EXISTS lm_index_t")


def test_landmark_index_probe_is_exchange_free_on_index_side(spark):
    """The 100 TB probe claim: with broadcast/AQE off and shuffle
    partitions matched to the bucket count, the vote join's index side
    reads the bucketed table with NO Exchange feeding it — only batch-
    side exchanges appear before the join."""
    import contextlib
    import io
    import shutil

    from easydb_server_spark.operators.audiofp import (
        landmark_search,
        write_landmark_index,
    )

    spark.sql("DROP TABLE IF EXISTS lm_index_p")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    shutil.rmtree(f"{wh}/lm_index_p", ignore_errors=True)
    corpus = _toy_lms(spark, [(i, t, i * 10 + t) for i in range(20) for t in range(4)])
    write_landmark_index(corpus, "lm_index_p", n_buckets=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        batch = _toy_lms(spark, [(99, t, 10 + t) for t in range(4)])
        df = landmark_search(spark.table("lm_index_p"), batch, min_votes=3)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "Bucketed: true" in plan
        assert "lm_index_p" in plan
        # the lock: 3 exchanges (batch-side lm shuffle, the vote
        # aggregate, the top-1 window) — the SAME probe against the
        # index as an inline DataFrame plans 4, the extra one being
        # the index-side lm shuffle that bucketing eliminates
        assert plan.count(") Exchange") == 3, plan
        import pyspark.sql.functions as F

        inline = landmark_search(
            spark.table("lm_index_p").select("item_id", "t", "lm")
            .unionAll(spark.range(0).selectExpr(
                "id as item_id", "cast(id as int) as t", "id as lm")),
            batch, min_votes=3,
        )
        buf2 = io.StringIO()
        with contextlib.redirect_stdout(buf2):
            inline.explain("formatted")
        assert buf2.getvalue().count(") Exchange") == 4
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.sql("DROP TABLE IF EXISTS lm_index_p")
