"""Perceptual-hash image dedup (operators/imagehash.py).

The conformance entries (dedup_image_phash / dedup_image_neardup) pin
the fixture pipeline against the DuckDB replay; these tests pin the
dHash properties the fixture can't demonstrate — brightness/scale
invariance, locality of single-pixel edits — and the LSH pair stage's
pigeonhole recall and plan shape on synthetic signatures.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def _img(w, h, seed=7):
    y, x = np.mgrid[0:h, 0:w]
    r = ((seed * 3 + y * 5 + x * 7) * 16 % 256).astype(np.uint8)
    g = ((seed * 5 + y * 11 + x * 3) * 37 % 256).astype(np.uint8)
    b = ((seed * 7 + y * 2 + x * 13) * 73 % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_dhash_brightness_invariant():
    """dHash compares adjacent cells, so a uniform brightness shift
    (no channel clipping) must not change a single bit."""
    from easydb_server_spark.operators.imagehash import dhash_bands

    px = _img(20, 15) // 2  # headroom so +40 can't clip
    assert dhash_bands(px) == dhash_bands(px + 40)


def test_dhash_exact_2x_upscale_invariant():
    """A 9x8 image and its pixel-doubled 18x16 version sample to the
    same source pixels (sx = (u*18)//9 = 2u, sy = (v*16)//8 = 2v), so
    the hash is bit-identical — the scale invariance dHash is for."""
    from easydb_server_spark.operators.imagehash import dhash_bands

    px = _img(9, 8)
    doubled = px.repeat(2, axis=0).repeat(2, axis=1)
    assert dhash_bands(px) == dhash_bands(doubled)


def test_dhash_single_pixel_edit_is_local():
    """Recoloring one pixel changes at most the two gradient bits that
    read its cell — near-dup edits stay within LSH reach."""
    from easydb_server_spark.operators.imagehash import dhash_bands

    px = _img(9, 8)
    edited = px.copy()
    edited[3, 4] = [255, 255, 255]
    a, b = dhash_bands(px), dhash_bands(edited)
    hamming = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
    assert hamming <= 2


def test_dhash_pairs_pigeonhole_and_pruning(spark):
    """Synthetic signatures: an identical pair (hamming 0), a pair 3
    bits apart ALL in one band (found — the other 3 bands still
    collide: the pigeonhole guarantee), and a signature different in
    every band (pruned — no shared band, correctly so since its
    hamming is far above max_hamming)."""
    from easydb_server_spark.operators.imagehash import dhash_pairs

    sigs = spark.createDataFrame(
        [
            (1, 100, 200, 300, 400),
            (2, 100, 200, 300, 400),          # == 1
            (3, 100 ^ 0b111, 200, 300, 400),  # 3 flips, all in band0
            (4, 101, 201, 301, 401),          # differs in every band
        ],
        "item_id BIGINT, band0 BIGINT, band1 BIGINT, band2 BIGINT, band3 BIGINT",
    )
    got = {
        (r["item_a"], r["item_b"]): r["hamming"]
        for r in dhash_pairs(sigs, max_hamming=3).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 3
    assert got[(2, 3)] == 3
    assert not any(4 in k for k in got)


def test_dhash_pairs_rejects_unguaranteed_threshold(spark):
    import pytest

    from easydb_server_spark.operators.imagehash import dhash_pairs

    sigs = spark.createDataFrame(
        [(1, 0, 0, 0, 0)], "item_id BIGINT, band0 BIGINT, band1 BIGINT, band2 BIGINT, band3 BIGINT"
    )
    with pytest.raises(ValueError, match="max_hamming"):
        dhash_pairs(sigs, max_hamming=4)


def test_dhash_pairs_plan_is_banded_not_all_pairs(spark):
    """The candidate stage must be an equi-join on (band, value) —
    no cartesian / broadcast-nested-loop anywhere in the plan."""
    from easydb_server_spark.operators.imagehash import dhash_pairs

    sigs = spark.createDataFrame(
        [(i, i % 7, i % 5, i % 3, i % 2) for i in range(40)],
        "item_id BIGINT, band0 BIGINT, band1 BIGINT, band2 BIGINT, band3 BIGINT",
    )
    plan = dhash_pairs(sigs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_dhash_matches_pure_function(spark):
    """The Arrow-batched stage and the pure function agree through a
    REAL GIF encode/decode round trip."""
    from easydb_server_spark.operators.gif import encode_gif
    from easydb_server_spark.operators.imagehash import dhash_bands, image_dhash

    imgs = {i: _img(10 + i, 9 + i, seed=i) for i in range(1, 4)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_gif(px))) for i, px in imgs.items()],
        "item_id BIGINT, payload BINARY",
    )
    got = {r["item_id"]: (r["band0"], r["band1"], r["band2"], r["band3"], r["phash"])
           for r in image_dhash(df, "payload", "item_id").collect()}
    for i, px in imgs.items():
        b0, b1, b2, b3 = dhash_bands(px)
        assert got[i] == (b0, b1, b2, b3, f"{b3:04x}{b2:04x}{b1:04x}{b0:04x}")


def test_frame_dhash_and_scene_cuts(spark):
    """Animated round trip: two static scenes of 3 frames each (scene
    B inverts the image); scene_cuts must flag exactly frames 0 and 3,
    with hamming 0 inside scenes and the first-frame hamming NULL."""
    from easydb_server_spark.operators.gif import encode_gif_animated
    from easydb_server_spark.operators.imagehash import frame_dhash, scene_cuts

    a = _img(12, 10)
    b = 255 - a
    blob = encode_gif_animated([a, a, a, b, b, b])
    df = spark.createDataFrame([(1, bytearray(blob))], "item_id BIGINT, payload BINARY")
    rows = {
        r["frame_idx"]: (r["hamming_prev"], r["is_scene_start"])
        for r in scene_cuts(frame_dhash(df, "payload", "item_id")).collect()
    }
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    assert rows[0] == (None, True)
    assert rows[1] == (0, False) and rows[2] == (0, False)
    assert rows[3][1] is True and rows[3][0] > 3  # inversion flips gradients
    assert rows[4] == (0, False) and rows[5] == (0, False)


def test_scene_cuts_plan_is_one_keyed_window(spark):
    """scene_cuts is ONE keyed shuffle: a window partitioned by
    item_id — never an unpartitioned (corpus-wide) window, never a
    join."""
    from easydb_server_spark.operators.imagehash import scene_cuts

    sigs = spark.createDataFrame(
        [(i % 3, i // 3, i, i + 1, i + 2, i + 3) for i in range(12)],
        "item_id BIGINT, frame_idx INT, band0 BIGINT, band1 BIGINT, band2 BIGINT, band3 BIGINT",
    )
    plan = scene_cuts(sigs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_keyframes_agree_with_scene_cuts_and_are_exchange_free(spark):
    """The fused in-row keyframes operator must select EXACTLY the
    frames the windowed scene_cuts flags, with a running scene index —
    and its plan must contain no Exchange at all (frames are
    item-local, so nothing ever shuffles)."""
    from easydb_server_spark.operators.gif import encode_gif_animated
    from easydb_server_spark.operators.imagehash import (
        frame_dhash,
        keyframes,
        scene_cuts,
    )

    pal = np.array(
        [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
        dtype=np.uint8,
    )
    y, x = np.mgrid[0:10, 0:12]
    a = pal[(y * 5 + x * 7) % 16]
    b = pal[(6 + y * 5 + x * 7) % 16]   # scene shift, same palette
    c = pal[(3 + y * 2 + x * 11) % 16]  # different gradient structure
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_gif_animated([a, a, b, b, c]))),
            (2, bytearray(encode_gif_animated([c, c, c]))),
        ],
        "item_id BIGINT, payload BINARY",
    )
    kf = keyframes(df, "payload", "item_id")
    plan = kf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    got = {(r["item_id"], r["frame_idx"]): r["scene_idx"] for r in kf.collect()}
    want = {
        (r["item_id"], r["frame_idx"])
        for r in scene_cuts(frame_dhash(df, "payload", "item_id")).collect()
        if r["is_scene_start"]
    }
    assert set(got) == want
    assert got[(1, 0)] == 1 and got[(2, 0)] == 1
    # scene indices are consecutive per item
    assert sorted(v for (i, _f), v in got.items() if i == 1) == list(
        range(1, 1 + sum(1 for k in got if k[0] == 1))
    )


def test_dhash_pairs_distinct_is_narrow(spark):
    """The r14 verdict ask: the candidate dedup must be a distinct on
    (item_a, item_b) ONLY — the widest shuffle in the operator carries
    two BIGINTs, with the band columns re-attached afterwards from the
    signature table. Locked via the aggregate keys: no HashAggregate
    in the plan may group on a band or attached-band column."""
    from easydb_server_spark.operators.imagehash import dhash_pairs

    sigs = spark.createDataFrame(
        [(i, i % 7, i % 5, i % 3, i % 2) for i in range(40)],
        "item_id BIGINT, band0 BIGINT, band1 BIGINT, band2 BIGINT, band3 BIGINT",
    )
    plan = dhash_pairs(sigs)._jdf.queryExecution().executedPlan().toString()
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert agg_lines, "the candidate distinct must still be present"
    for ln in agg_lines:
        assert "band0" not in ln and "xa0" not in ln and "ya0" not in ln, ln
        assert "item_a" in ln and "item_b" in ln, ln


def test_video_signature_is_zero_exchange_and_matches_keyframes(spark):
    """video_signature's scene sequence must list exactly the frames
    keyframes() selects (same fused detection), as 16-hex dHash words,
    with a zero-exchange plan."""
    from easydb_server_spark.operators.gif import encode_gif_animated
    from easydb_server_spark.operators.imagehash import (
        frame_dhash,
        keyframes,
        video_signature,
    )

    pal = np.array(
        [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
        dtype=np.uint8,
    )
    y, x = np.mgrid[0:10, 0:12]
    a = pal[(y * 5 + x * 7) % 16]
    b = pal[(6 + y * 5 + x * 7) % 16]
    c = pal[(3 + y * 2 + x * 11) % 16]
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_gif_animated([a, a, b, b, c]))),
            (2, bytearray(encode_gif_animated([c, c, c]))),
        ],
        "item_id BIGINT, payload BINARY",
    )
    vs = video_signature(df, "payload", "item_id")
    plan = vs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    got = {r["item_id"]: r for r in vs.collect()}
    kf_count = {}
    for r in keyframes(df, "payload", "item_id").collect():
        kf_count[r["item_id"]] = kf_count.get(r["item_id"], 0) + 1
    assert {i: r["n_scenes"] for i, r in got.items()} == kf_count
    # each word is the scene-start frame's phash (check item 2: one
    # static scene -> one word == frame 0's hash)
    fd = {
        (r["item_id"], r["frame_idx"]): (r["band0"], r["band1"], r["band2"], r["band3"])
        for r in frame_dhash(df, "payload", "item_id").collect()
    }
    b0, b1, b2, b3 = fd[(2, 0)]
    assert got[2]["sig_seq"] == f"{b3:04x}{b2:04x}{b1:04x}{b0:04x}"
    import hashlib

    assert got[2]["sig"] == hashlib.md5(got[2]["sig_seq"].encode()).hexdigest()


def test_video_neardup_pairs_tolerance_and_pruning(spark):
    """Synthetic signatures: exact dup (0 mismatches), one-scene-
    differs (1 — found via the untouched chunk: pigeonhole), two-
    scene-differs (pruned by verification), different scene COUNTS
    never candidate."""
    from easydb_server_spark.operators.imagehash import video_neardup_pairs

    def row(i, words):
        return (i, len(words), "-".join(words))

    sigs = spark.createDataFrame(
        [
            row(1, ["aaaa", "bbbb", "cccc"]),
            row(2, ["aaaa", "bbbb", "cccc"]),  # exact dup of 1
            row(3, ["aaaa", "ffff", "cccc"]),  # scene 1 differs
            row(4, ["eeee", "ffff", "cccc"]),  # 2 scenes differ from 1
            row(5, ["aaaa", "bbbb", "cccc", "dddd"]),  # length 4: never pairs
        ],
        "item_id BIGINT, n_scenes INT, sig_seq STRING",
    )
    got = {
        (r["item_a"], r["item_b"]): r["mismatches"]
        for r in video_neardup_pairs(sigs, max_diff=1).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1 and got[(2, 3)] == 1
    assert got[(3, 4)] == 1  # differ at position 0 only; share the tail chunk
    assert (1, 4) not in got and (2, 4) not in got
    assert not any(5 in k for k in got)


def test_video_neardup_distinct_is_narrow(spark):
    """Same rule as dhash_pairs: the candidate distinct groups on
    (item_a, item_b) only — sequences re-attach from the signature
    table for verification."""
    from easydb_server_spark.operators.imagehash import video_neardup_pairs

    sigs = spark.createDataFrame(
        [(i, 3, f"{i % 4:04x}-{i % 3:04x}-{i % 2:04x}") for i in range(20)],
        "item_id BIGINT, n_scenes INT, sig_seq STRING",
    )
    plan = (
        video_neardup_pairs(sigs, max_diff=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert agg_lines
    for ln in agg_lines:
        assert "sig_seq" not in ln and "bdig" not in ln, ln
        assert "item_a" in ln and "item_b" in ln, ln


def test_scene_landmarks_shift_robust_and_search_crossmodal(spark):
    """The video constellation: a clip with a PREPENDED scene keeps
    every landmark of the shared span (superset), and the SAME
    offset-voting matcher used for audio (audiofp.landmark_search)
    retrieves the source at the pad offset — the cross-modal reuse
    the operators are designed for."""
    import hashlib

    from easydb_server_spark.operators.audiofp import landmark_search
    from easydb_server_spark.operators.imagehash import scene_landmarks

    sigs = spark.createDataFrame(
        [
            (1, 3, "aaaa-bbbb-cccc"),           # index clip
            (10, 4, "9999-aaaa-bbbb-cccc"),     # query: one prepended scene
        ],
        "item_id BIGINT, n_scenes INT, sig_seq STRING",
    )
    lms = scene_landmarks(sigs, fanout=3)
    by_item = {}
    for r in lms.collect():
        by_item.setdefault(r["item_id"], set()).add((r["t"], r["lm"]))
    assert {l for _t, l in by_item[1]} <= {l for _t, l in by_item[10]}
    want = hashlib.md5(b"aaaa:bbbb:1").hexdigest()
    assert (0, want) in by_item[1] and (1, want) in by_item[10]
    [row] = landmark_search(
        lms.where("item_id < 10"), lms.where("item_id >= 10"), min_votes=3
    ).collect()
    assert (row["query_id"], row["match_id"], row["offset"], row["votes"]) == (
        10, 1, -1, 3,
    )


def test_phash_search_nearest_tiebreak_and_radius(spark):
    """Retrieval semantics: exact hash match wins at hamming 0 with
    ties to the smaller index id; a 3-bit-away query is still found
    (pigeonhole: some band must match); a query beyond the radius of
    every index image returns NO row."""
    from easydb_server_spark.operators.imagehash import phash_search

    schema = "item_id BIGINT, band0 BIGINT, band1 BIGINT, band2 BIGINT, band3 BIGINT"
    index = spark.createDataFrame(
        [(5, 100, 200, 300, 400), (2, 100, 200, 300, 400), (7, 900, 901, 902, 903)],
        schema,
    )
    queries = spark.createDataFrame(
        [
            (10, 100, 200, 300, 400),          # exact: ties 2 vs 5 -> 2
            (11, 100 ^ 0b111, 200, 300, 400),  # 3 flips in band0
            (12, 1, 2, 3, 4),                  # nothing within hamming 3
        ],
        schema,
    )
    got = {
        r["query_id"]: (r["match_id"], r["hamming"])
        for r in phash_search(index, queries, max_hamming=3).collect()
    }
    assert got == {10: (2, 0), 11: (2, 3)}


def test_phash_search_distinct_is_narrow(spark):
    """The probe-side candidate distinct groups on the id pair only,
    same as dhash_pairs."""
    from easydb_server_spark.operators.imagehash import phash_search

    schema = "item_id BIGINT, band0 BIGINT, band1 BIGINT, band2 BIGINT, band3 BIGINT"
    index = spark.createDataFrame([(i, i % 7, i % 5, i % 3, i % 2) for i in range(20)], schema)
    queries = spark.createDataFrame(
        [(100 + i, i % 7, i % 5, i % 3, i % 2) for i in range(5)], schema
    )
    plan = (
        phash_search(index, queries)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert agg_lines
    for ln in agg_lines:
        assert "band0" not in ln and "qa0" not in ln and "xa0" not in ln, ln
        assert "query_id" in ln and "match_id" in ln, ln


def test_video_neardup_excludes_degenerate_short_clips(spark):
    """r15 hardening: clips with n_scenes <= max_diff never pair —
    semantically (a 1-scene clip "within 1 mismatch" of another is
    100% different) and mechanically (the ceil-split would give them
    an EMPTY chunk whose md5('') digest is a universal join key —
    every short clip in the corpus would collide into one bucket)."""
    from easydb_server_spark.operators.imagehash import video_neardup_pairs

    sigs = spark.createDataFrame(
        [
            (1, 1, "aaaa"),
            (2, 1, "bbbb"),            # different single scene: NOT a near-dup
            (3, 1, "aaaa"),            # identical single scene: exact dedup's
                                       # job (the full digest), not tolerance's
            (4, 2, "aaaa-cccc"),
            (5, 2, "aaaa-dddd"),       # 2 scenes, 1 mismatch: still pairs
        ],
        "item_id BIGINT, n_scenes INT, sig_seq STRING",
    )
    got = {
        (r["item_a"], r["item_b"])
        for r in video_neardup_pairs(sigs, max_diff=1).collect()
    }
    assert got == {(4, 5)}


def test_phash_topk_ranked_and_bounded(spark):
    """Top-k generalization: every index image within the radius
    appears ranked by (hamming, match_id); k truncates; top-1 equals
    phash_search row-for-row."""
    from easydb_server_spark.operators.imagehash import phash_search, phash_topk

    schema = "item_id BIGINT, band0 BIGINT, band1 BIGINT, band2 BIGINT, band3 BIGINT"
    index = spark.createDataFrame(
        [(5, 100, 200, 300, 400), (2, 100, 200, 300, 400),
         (9, 100 ^ 1, 200, 300, 400), (7, 900, 901, 902, 903)],
        schema,
    )
    queries = spark.createDataFrame([(10, 100, 200, 300, 400)], schema)
    got = [
        (r["match_id"], r["hamming"], r["rank"])
        for r in phash_topk(index, queries, k=3).orderBy("rank").collect()
    ]
    assert got == [(2, 0, 1), (5, 0, 2), (9, 1, 3)]
    top2 = phash_topk(index, queries, k=2).count()
    assert top2 == 2
    top1 = {
        (r["query_id"], r["match_id"], r["hamming"])
        for r in phash_search(index, queries).collect()
    }
    ranked1 = {
        (r["query_id"], r["match_id"], r["hamming"])
        for r in phash_topk(index, queries, k=1).collect()
    }
    assert top1 == ranked1
    import pytest

    with pytest.raises(ValueError):
        phash_topk(index, queries, k=0)


def test_phash_search_stop_bucket_guard(spark):
    """r15 ADVICE: a hot (band, value) cell (many index images sharing
    a band) fans the candidate join out with the cell population;
    max_bucket drops such cells BEFORE the join. Queries reaching the
    index ONLY through the hot band find nothing (the documented
    trade); queries with a clean band are unaffected."""
    from easydb_server_spark.operators.imagehash import phash_search

    schema = "item_id BIGINT, band0 BIGINT, band1 BIGINT, band2 BIGINT, band3 BIGINT"
    # band0=777 is hot (all 11 index images share it). Item 20 is
    # hamming-3 from query 100 with bands 1-3 each differing by one
    # bit, so the HOT band is its only candidate path. Item 3 shares
    # band1=55 with query 101 — a clean path the cap must not touch.
    index = spark.createDataFrame(
        [(i, 777, 1000 + i if i != 3 else 55, 2000 + i, 3000 + i) for i in range(10)]
        + [(20, 777, 5 ^ 1, 6 ^ 1, 7 ^ 1)],
        schema,
    )
    queries = spark.createDataFrame(
        [(100, 777, 5, 6, 7),    # reaches item 20 only through band0
         (101, 777, 55, 6, 7)],  # band1 also matches item 3
        schema,
    )
    uncapped = {
        r["query_id"]: (r["match_id"], r["hamming"])
        for r in phash_search(index, queries, max_hamming=3, max_bucket=None).collect()
    }
    assert uncapped[100] == (20, 3)
    capped = {
        r["query_id"]: (r["match_id"], r["hamming"])
        for r in phash_search(index, queries, max_hamming=3, max_bucket=5).collect()
    }
    # query 100's sole candidate path was the hot band: stopped
    assert 100 not in capped
    # query 101's clean band1 path survives, same winner as uncapped
    assert capped.get(101) == uncapped.get(101)
