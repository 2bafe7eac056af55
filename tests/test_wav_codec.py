"""WAV/PCM codec (r8 verdict ask #5): the multimodal pipeline's second
real modality — pure-stdlib RIFF/WAVE encode/decode round-trips, the
registry-compatible feature decoder, and the Arrow-batched
audio_features operator end-to-end on Spark."""

import numpy as np
import pytest

from easydb_server_spark.operators.wav import decode_wav, encode_wav, wav_decoder


def _saw(n, seed=7919, step=104729):
    i = np.arange(n, dtype=np.int64)
    return ((seed + i * step) % 65536 - 32768).astype(np.int16)


class TestWavCodec:
    def test_mono_roundtrip(self):
        s = _saw(123)
        arr, rate = decode_wav(encode_wav(s, 8000))
        assert rate == 8000
        assert arr.shape == (123, 1)
        assert (arr.ravel() == s).all()

    def test_stereo_roundtrip(self):
        st = np.stack([_saw(64), _saw(64)[::-1]], axis=1)
        arr, rate = decode_wav(encode_wav(st, 44100))
        assert rate == 44100 and arr.shape == (64, 2) and (arr == st).all()

    def test_extra_chunks_skipped(self):
        # a LIST chunk between fmt and data must be walked over, and an
        # odd-sized chunk's pad byte honored
        payload = encode_wav(_saw(10), 8000)
        hdr, rest = payload[:12], payload[12:]
        extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
        import struct

        patched = (
            struct.pack("<4sI4s", b"RIFF", 4 + len(extra) + len(rest), b"WAVE")
            + extra
            + rest
        )
        arr, rate = decode_wav(patched)
        assert (arr.ravel() == _saw(10)).all()

    @pytest.mark.parametrize(
        "bad",
        [b"", b"xx", b"RIFF\x00\x00\x00\x00AVI ", b"RIFF\x08\x00\x00\x00WAVE"],
    )
    def test_bad_payloads_raise(self, bad):
        with pytest.raises(ValueError):
            decode_wav(bad)

    def test_truncated_data_raises(self):
        payload = encode_wav(_saw(50), 8000)
        with pytest.raises(ValueError):
            decode_wav(payload[:-20])

    def test_non_pcm_rejected(self):
        # flip the format tag to 3 (IEEE float) — honest failure
        payload = bytearray(encode_wav(_saw(4), 8000))
        payload[20] = 3
        with pytest.raises(ValueError, match="PCM"):
            decode_wav(bytes(payload))

    def test_decoder_features(self):
        s = np.array([0, 32767, -32768, 100] * 25, dtype=np.int16)
        feats = wav_decoder(encode_wav(s, 16000))
        assert feats["n_samples"] == 100
        assert feats["sample_rate"] == 16000
        assert feats["n_channels"] == 1
        assert feats["duration_ms"] == 100 * 1000 // 16000
        assert feats["clipping_frac"] == pytest.approx(0.5)
        assert feats["peak"] == 32768
        expected_rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))
        assert feats["rms"] == pytest.approx(expected_rms)


class TestAudioFeaturesOperator:
    def test_spark_end_to_end(self, spark):
        from easydb_server_spark.operators.multimodal import audio_features

        rows = [(i, bytes(encode_wav(_saw(100 + i), 8000))) for i in range(6)]
        df = spark.createDataFrame(rows, "item_id long, payload binary")
        out = audio_features(df, "payload", "item_id").orderBy("item_id").collect()
        assert len(out) == 6
        for i, r in enumerate(out):
            ref = wav_decoder(bytes(encode_wav(_saw(100 + i), 8000)))
            assert r.n_samples == ref["n_samples"] == 100 + i
            assert r.rms == pytest.approx(round(ref["rms"], 4))
            assert r.clipping_frac == ref["clipping_frac"]
            assert r.duration_ms == ref["duration_ms"]


class TestResample:
    def test_resample_halves_and_preserves_duration(self):
        from easydb_server_spark.operators.wav import decode_wav, resample_wav

        s = _saw(16000)
        out = resample_wav(encode_wav(s, 16000), 8000)
        arr, rate = decode_wav(out)
        assert rate == 8000 and arr.shape[0] == 8000
        # nearest-sample: output frame i is input frame 2i
        assert (arr.ravel() == s[::2]).all()

    def test_resample_upsamples_by_repetition(self):
        from easydb_server_spark.operators.wav import decode_wav, resample_wav

        s = _saw(100)
        arr, rate = decode_wav(resample_wav(encode_wav(s, 8000), 16000))
        assert rate == 16000 and arr.shape[0] == 200
        assert (arr.ravel()[::2] == s).all() and (arr.ravel()[1::2] == s).all()

    def test_resample_rejects_bad_rate(self):
        import pytest as _pytest

        from easydb_server_spark.operators.wav import resample_wav

        with _pytest.raises(ValueError):
            resample_wav(encode_wav(_saw(10), 8000), 0)

    def test_resample_audio_operator(self, spark):
        from easydb_server_spark.operators.multimodal import resample_audio
        from easydb_server_spark.operators.wav import decode_wav

        rows = [(i, bytes(encode_wav(_saw(800 + i), 8000))) for i in range(4)]
        df = spark.createDataFrame(rows, "item_id long, payload binary")
        out = resample_audio(df, "payload", "item_id", 4000).orderBy("item_id").collect()
        for i, r in enumerate(out):
            assert r.sample_rate == 4000
            assert r.n_samples == (800 + i) // 2
            arr, rate = decode_wav(bytes(r.payload))
            assert rate == 4000 and arr.shape[0] == r.n_samples


class TestWavFuzz:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    @settings(max_examples=80, deadline=None)
    @given(
        n=st.integers(0, 400),
        channels=st.integers(1, 4),
        rate=st.sampled_from([8000, 16000, 22050, 44100]),
        seed=st.integers(0, 2**31),
    )
    def test_roundtrip_any_geometry(n, channels, rate, seed):
        """encode->decode is the identity for ANY sample geometry,
        including n=0 (empty data chunk) and odd byte counts (the
        word-alignment pad path)."""
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=(n, channels), dtype=np.int16)
        arr, r = decode_wav(encode_wav(s, rate))
        assert r == rate and arr.shape == (n, channels)
        assert (arr == s).all()

    @staticmethod
    @settings(max_examples=40, deadline=None)
    @given(n=st.integers(1, 300), seed=st.integers(0, 2**31))
    def test_decoder_features_match_numpy(n, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        feats = wav_decoder(encode_wav(s, 8000))
        flat = s.astype(np.float64)
        assert feats["rms"] == pytest.approx(float(np.sqrt(np.mean(flat * flat))))
        assert feats["peak"] == int(np.max(np.abs(flat)))
        assert feats["clipping_frac"] == float(np.mean(np.abs(flat) >= 32767))


class TestBitDepths:
    """8/24-bit PCM + channel remix (r9 verdict ask #6)."""

    def test_24bit_roundtrip_exact(self):
        from easydb_server_spark.operators.wav import decode_wav_full

        s = _saw(201)
        arr, rate, bits = decode_wav_full(encode_wav(s, 8000, bits=24))
        assert (bits, rate) == (24, 8000)
        # 24-bit carries the full int16 range losslessly
        assert (arr.ravel() == s).all()

    def test_8bit_roundtrip_is_high_byte_quantization(self):
        from easydb_server_spark.operators.wav import decode_wav_full

        s = _saw(100)
        arr, rate, bits = decode_wav_full(encode_wav(s, 8000, bits=8))
        assert (bits, rate) == (8, 8000)
        expect = ((s.astype(np.int32) >> 8) << 8).astype(np.int16)
        assert (arr.ravel() == expect).all()

    def test_8bit_bias_per_spec(self):
        # 8-bit WAV is UNSIGNED with a 128 bias: silence encodes as 0x80
        payload = encode_wav(np.zeros(4, dtype=np.int16), 8000, bits=8)
        assert payload[-4:] == b"\x80\x80\x80\x80"

    def test_unsupported_depth_rejected(self):
        with pytest.raises(ValueError, match="bits"):
            encode_wav(_saw(4), 8000, bits=32)
        payload = bytearray(encode_wav(_saw(4), 8000))
        payload[34] = 32  # fmt bits-per-sample field
        with pytest.raises(ValueError, match="PCM"):
            decode_wav(bytes(payload))

    def test_resample_preserves_depth(self):
        from easydb_server_spark.operators.wav import decode_wav_full, resample_wav

        out = resample_wav(encode_wav(_saw(100), 16000, bits=24), 8000)
        _, rate, bits = decode_wav_full(out)
        assert (rate, bits) == (8000, 24)

    def test_features_accept_all_depths(self):
        s = _saw(64)
        for bits in (8, 16, 24):
            feats = wav_decoder(encode_wav(s, 8000, bits=bits))
            assert feats["bits"] == bits and feats["n_samples"] == 64

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(0, 200),
        channels=st.integers(1, 3),
        bits=st.sampled_from([8, 16, 24]),
        seed=st.integers(0, 2**31),
    )
    def test_roundtrip_idempotent_across_depths(n, channels, bits, seed):
        """decode∘encode is idempotent at every depth: the first pass
        quantizes (8-bit), the second is the identity on the quantized
        samples — any geometry, including the odd-byte-count pad path
        (24-bit mono with odd n)."""
        from easydb_server_spark.operators.wav import decode_wav_full

        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=(n, channels), dtype=np.int16)
        once, rate, b = decode_wav_full(encode_wav(s, 8000, bits=bits))
        twice, _, _ = decode_wav_full(encode_wav(once, 8000, bits=bits))
        assert b == bits and once.shape == (n, channels)
        assert (once == twice).all()
        if bits != 8:
            assert (once == s).all()


class TestRemix:
    def test_stereo_to_mono_integer_mean(self):
        from easydb_server_spark.operators.wav import decode_wav_full, remix_wav

        st_ = np.array([[100, 200], [-5, -6], [32767, 32767]], dtype=np.int16)
        arr, rate, bits = decode_wav_full(remix_wav(encode_wav(st_, 8000), 1))
        assert arr.shape == (3, 1) and (rate, bits) == (8000, 16)
        # floor division: (-5 + -6) // 2 = -6 (toward -inf, deterministic)
        assert arr.ravel().tolist() == [150, -6, 32767]

    def test_mono_to_stereo_duplicates(self):
        from easydb_server_spark.operators.wav import decode_wav, remix_wav

        s = _saw(40)
        arr, _ = decode_wav(remix_wav(encode_wav(s, 8000), 2))
        assert arr.shape == (40, 2)
        assert (arr[:, 0] == s).all() and (arr[:, 1] == s).all()

    def test_same_channels_noop_and_bad_matrix_rejected(self):
        from easydb_server_spark.operators.wav import decode_wav, remix_wav

        st_ = np.stack([_saw(10), _saw(10)], axis=1)
        arr, _ = decode_wav(remix_wav(encode_wav(st_, 8000), 2))
        assert (arr == st_).all()
        with pytest.raises(ValueError, match="canonical"):
            remix_wav(encode_wav(st_, 8000), 3)

    def test_remix_preserves_depth(self):
        from easydb_server_spark.operators.wav import decode_wav_full, remix_wav

        st_ = np.stack([_saw(21), _saw(21)], axis=1)
        _, rate, bits = decode_wav_full(remix_wav(encode_wav(st_, 8000, bits=24), 1))
        assert (rate, bits) == (8000, 24)

    def test_remix_audio_operator(self, spark):
        from easydb_server_spark.operators.multimodal import remix_audio
        from easydb_server_spark.operators.wav import decode_wav

        rows = [
            (i, bytes(encode_wav(np.stack([_saw(50 + i), _saw(50 + i)], axis=1), 8000)))
            for i in range(4)
        ]
        df = spark.createDataFrame(rows, "item_id long, payload binary")
        out = remix_audio(df, "payload", "item_id", 1).orderBy("item_id").collect()
        for i, r in enumerate(out):
            assert r.n_channels == 1 and r.n_samples == 50 + i
            arr, _ = decode_wav(bytes(r.payload))
            assert (arr.ravel() == _saw(50 + i)).all()
