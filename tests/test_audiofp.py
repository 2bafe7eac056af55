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
