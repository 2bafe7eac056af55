"""G.711 companding (operators/g711.py) and the spectral/periodicity
analysis operators (operators/multimodal.py): spec invariants, known
ITU vectors, and analytically-known signals."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from easydb_server_spark.operators.g711 import (
    alaw_compress,
    alaw_expand,
    g711_roundtrip,
    mulaw_compress,
    mulaw_expand,
)
from easydb_server_spark.operators.wav import encode_wav


def test_mulaw_known_vectors():
    # standard G.711 mu-law encodings (Sun reference implementation)
    assert mulaw_compress(np.array([0], dtype=np.int16))[0] == 0xFF
    assert mulaw_compress(np.array([-1], dtype=np.int16))[0] == 0x7F
    assert mulaw_compress(np.array([32635], dtype=np.int16))[0] == 0x80
    assert mulaw_expand(np.array([0xFF], dtype=np.uint8))[0] == 0
    assert alaw_compress(np.array([0], dtype=np.int16))[0] == 0xD5


def test_mulaw_staircase_error_bounds():
    s = np.arange(-32768, 32768, dtype=np.int16)
    r = mulaw_expand(mulaw_compress(s)).astype(np.int32)
    err = np.abs(r - s.astype(np.int32))
    # below the clip point the error is bounded by half the top
    # segment step (512); the clip region adds 32767-32635
    inside = np.abs(s.astype(np.int32)) <= 32635
    assert err[inside].max() <= 512
    assert err.max() <= 512 + (32767 - 32635)
    assert np.all(np.diff(r) >= 0)  # staircase is monotone


def test_alaw_staircase_error_bounds():
    s = np.arange(-32768, 32768, dtype=np.int16)
    r = alaw_expand(alaw_compress(s)).astype(np.int32)
    assert np.abs(r - s.astype(np.int32)).max() <= 512
    assert np.all(np.diff(r) >= 0)


def test_alaw_idempotent_all_bytes():
    b = np.arange(256, dtype=np.uint8)
    assert np.array_equal(alaw_compress(alaw_expand(b)), b)


def test_mulaw_idempotent_modulo_negative_zero():
    # mu-law has two zero codes (0x7F = -0, 0xFF = +0); re-encoding
    # collapses -0 onto +0, every other byte round-trips
    b = np.arange(256, dtype=np.uint8)
    again = mulaw_compress(mulaw_expand(b))
    diff = np.nonzero(again != b)[0]
    assert list(diff) == [0x7F]
    assert again[0x7F] == 0xFF


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64))
def test_g711_double_roundtrip_is_fixed_point(xs):
    # expand(compress(.)) is a projection: applying it twice equals once
    s = np.array(xs, dtype=np.int16)
    for law in ("mulaw", "alaw"):
        once = g711_roundtrip(s, law)
        assert np.array_equal(g711_roundtrip(once, law), once)


def test_g711_unknown_law_raises():
    with pytest.raises(ValueError):
        g711_roundtrip(np.zeros(4, dtype=np.int16), "opus")


def _clip_df(spark, samples, rate=8000):
    payload = encode_wav(samples, rate)
    return spark.createDataFrame([(1, bytearray(payload))], ["item_id", "payload"])


def test_transcode_g711_staircases_payload(spark):
    from easydb_server_spark.operators.multimodal import transcode_g711
    from easydb_server_spark.operators.wav import decode_wav

    s = (np.arange(100, dtype=np.int32) * 517 - 25000).astype(np.int16)
    df = _clip_df(spark, s)
    (row,) = transcode_g711(df, "payload", "item_id", "mulaw").collect()
    got, rate = decode_wav(bytes(row.payload))
    assert rate == 8000 and row.law == "mulaw"
    assert np.array_equal(got[:, 0], g711_roundtrip(s, "mulaw"))


def test_audio_analysis_periodic_signal(spark):
    from easydb_server_spark.operators.multimodal import audio_analysis

    # exact period-5 square-ish wave: autocorrelation peaks at lag 5
    s = np.tile(np.array([2000, 2000, -100, -2000, -2000], dtype=np.int16), 40)
    (row,) = audio_analysis(_clip_df(spark, s), "payload", "item_id", max_lag=8).collect()
    assert row.dominant_lag == 5
    assert row.energy == int(np.sum(s.astype(np.int64) ** 2))
    # 2 sign transitions per period, 40 periods, minus the final edge
    # that has no successor
    assert row.zero_crossings == 2 * 40 - 1


def test_audio_spectrogram_pure_tone(spark):
    from easydb_server_spark.operators.multimodal import audio_spectrogram

    # pure tone at bin 8 of a 64-sample frame: 8 cycles / 64 samples
    n, frame, k = 256, 64, 8
    t = np.arange(n)
    s = (20000 * np.sin(2 * np.pi * k * t / frame)).astype(np.int16)
    (row,) = audio_spectrogram(
        _clip_df(spark, s), "payload", "item_id", frame=frame, hop=32
    ).collect()
    assert row.dominant_bin == k
    assert abs(row.spectral_centroid - k) < 0.5
    assert row.n_frames == (n - frame) // 32 + 1


def test_audio_spectrogram_dc_vs_tone_separation(spark):
    from easydb_server_spark.operators.multimodal import audio_spectrogram

    s = np.full(128, 15000, dtype=np.int16)  # pure DC -> bin 0
    (row,) = audio_spectrogram(_clip_df(spark, s), "payload", "item_id").collect()
    assert row.dominant_bin == 0
