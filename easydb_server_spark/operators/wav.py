"""Pure-stdlib WAV/PCM audio codec — the multimodal pipeline's second
REAL modality (images: :mod:`easydb_server_spark.operators.bmp` /
``png``; audio: this module). No audio libraries exist in this
container, but canonical RIFF/WAVE with 16-bit integer PCM needs only
``struct`` + numpy, both available.

``wav_decoder`` plugs into
:func:`easydb_server_spark.operators.multimodal.register_decoder`
("audio"), and :func:`easydb_server_spark.operators.multimodal.
audio_features` extracts the curation signals a training-data audio
pipeline gates on — duration, RMS level, clipping fraction — inside
the Arrow-batched ``mapInPandas`` workers. ffmpeg/soundfile would
register the same way for MP3/FLAC/Opus.

Format notes (RIFF spec / WAVE PCM): 12-byte RIFF header declaring a
``WAVE`` form, then tagged chunks — ``fmt `` (16-byte PCM body:
format tag 1, channels, sample rate, byte rate, block align, bits per
sample) and ``data`` (interleaved little-endian samples). Chunks are
word-aligned: an odd-sized chunk is followed by one pad byte.

Integer PCM (format tag 1) at 8, 16, or 24 bits is supported — real
WAV corpora are not uniformly 16-bit (r9 verdict ask #6). The
in-memory canonical form is ALWAYS int16: 8-bit WAV data is unsigned
with a 128 bias (per spec) and widens via ``(u − 128) << 8``; 24-bit
is signed little-endian 3-byte and narrows via ``v >> 8`` (the high
16 bits), so every downstream consumer (features, resampling, remix)
sees one dtype and the full-scale/clipping arithmetic stays fixed.
Float (format 3) / ADPCM / other depths raise ``ValueError`` (honest
failure, same policy as the BMP/PNG codecs' unsupported variants).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """(n,) or (n, channels) int16 array → RIFF/WAVE PCM bytes at the
    requested depth. 8-bit quantizes to the high byte (+128 bias, per
    spec); 24-bit widens via ``s << 8`` — both are the standard
    shift-preserving-full-scale conversions, so
    ``decode(encode(s, bits=8))`` equals ``(s >> 8) << 8``."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("expected (n,) or (n, channels) samples")
    if bits not in (8, 16, 24):
        raise ValueError(f"bits must be 8, 16, or 24, got {bits}")
    n, channels = samples.shape
    block_align = channels * (bits // 8)
    fmt_body = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    if bits == 8:
        data_body = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data_body = samples.astype("<i2").tobytes()
    else:  # 24-bit: low 3 bytes of the LE int32 (s << 8)
        v = (samples.astype(np.int32) << 8).astype("<i4")
        data_body = (
            v.reshape(-1).view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
        )
    chunks = b"".join(
        struct.pack("<4sI", tag, len(body)) + body + (b"\x00" if len(body) % 2 else b"")
        for tag, body in ((b"fmt ", fmt_body), (b"data", data_body))
    )
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → ((n, channels) int16 array, sample_rate).

    Accepts 8/16/24-bit integer PCM (canonicalized to int16 — module
    docstring). Walks the chunk list (so extra chunks like
    ``LIST``/``cue `` are skipped, not fatal); requires a PCM ``fmt ``
    chunk before ``data``. Truncated or non-PCM payloads raise
    ``ValueError``.
    """
    samples, rate, _bits = decode_wav_full(payload)
    return samples, rate


def decode_wav_full(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Like :func:`decode_wav` but also returns the SOURCE bit depth,
    so re-encoding paths (:func:`resample_wav`, :func:`remix_wav`)
    can preserve it."""
    if len(payload) < 12:
        raise ValueError("not a WAV payload (too short)")
    magic, _size, form = struct.unpack_from("<4sI4s", payload, 0)
    if magic != b"RIFF" or form != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off, fmt, data = 12, None, None
    while off + 8 <= len(payload):
        tag, size = struct.unpack_from("<4sI", payload, off)
        body_off = off + 8
        if body_off + size > len(payload):
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", payload, body_off)
        elif tag == b"data":
            data = payload[body_off : body_off + size]
        off = body_off + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    format_tag, channels, sample_rate, _brate, _balign, bits = fmt
    if format_tag != 1 or bits not in (8, 16, 24):
        raise ValueError(
            f"only 8/16/24-bit integer PCM supported (format={format_tag}, bits={bits})"
        )
    if channels < 1:
        raise ValueError("channel count must be >= 1")
    frame = channels * (bits // 8)
    n = len(data) // frame
    if bits == 8:
        u = np.frombuffer(data, dtype=np.uint8, count=n * channels)
        flat = ((u.astype(np.int32) - 128) << 8).astype(np.int16)
    elif bits == 16:
        flat = np.frombuffer(data, dtype="<i2", count=n * channels).astype(np.int16)
    else:  # 24-bit signed LE → sign-extend → high 16 bits
        b = np.frombuffer(data, dtype=np.uint8, count=n * channels * 3).reshape(-1, 3)
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        flat = (v >> 8).astype(np.int16)
    return flat.reshape(n, channels), sample_rate, bits


def resample_wav(payload: bytes, target_rate: int) -> bytes:
    """Decode → nearest-sample rate conversion → re-encode (real
    samples) — the audio analogue of the image codecs' nearest-neighbor
    resize: index arithmetic only (output frame i reads input frame
    ``i·in_rate//out_rate``), no interpolation libraries. Preserves
    channel count; duration is preserved to within one frame.
    """
    samples, rate, bits = decode_wav_full(payload)
    if target_rate <= 0:
        raise ValueError("target_rate must be positive")
    n_out = max(samples.shape[0] * target_rate // rate, 1) if samples.shape[0] else 0
    idx = (np.arange(n_out) * rate) // target_rate
    return encode_wav(samples[idx], target_rate, bits=bits)


def remix_wav(payload: bytes, target_channels: int) -> bytes:
    """Channel remix — the other geometry normalization a mixed audio
    corpus needs before batching (r9 verdict ask #6): stereo/N-channel
    → MONO by per-frame integer mean (sum // n, floor — deterministic,
    replayable integer arithmetic, no float rounding to pin down), and
    mono → N by duplication. Preserves sample rate and bit depth.
    Arbitrary N→M (matrixed surround downmix) has no canonical integer
    definition and raises ``ValueError``.
    """
    samples, rate, bits = decode_wav_full(payload)
    if target_channels < 1:
        raise ValueError("target_channels must be >= 1")
    channels = samples.shape[1]
    if channels == target_channels:
        out = samples
    elif target_channels == 1:
        out = (
            samples.astype(np.int64).sum(axis=1) // channels
        ).astype(np.int16)[:, None]
    elif channels == 1:
        out = np.repeat(samples, target_channels, axis=1)
    else:
        raise ValueError(
            f"no canonical {channels}→{target_channels} channel matrix; "
            "remix via mono"
        )
    return encode_wav(out, rate, bits=bits)


def wav_decoder(payload: bytes) -> dict:
    """Registry-compatible decoder: the audio-curation feature set.

    Plug in with ``register_decoder("audio", wav_decoder)`` — runs
    inside the Arrow-batched mapInPandas workers, vectorized numpy per
    clip, no driver involvement. Features:

    - ``sample_rate``, ``n_channels``, ``n_samples`` (frames),
      ``duration_ms`` (integer milliseconds — engine-portable);
    - ``rms``: root-mean-square sample level over all channels — the
      loudness gate (near-silent clips are curation drops);
    - ``clipping_frac``: fraction of samples at or beyond full scale
      (|s| ≥ 32767 — both int16 rails) — the distortion gate;
    - ``peak``: max |sample|.
    """
    samples, rate, bits = decode_wav_full(payload)
    flat = samples.astype(np.float64).ravel()
    n = flat.size
    return {
        "bits": int(bits),
        "sample_rate": int(rate),
        "n_channels": int(samples.shape[1]),
        "n_samples": int(samples.shape[0]),
        "duration_ms": int(samples.shape[0] * 1000 // rate) if rate else 0,
        "rms": float(np.sqrt(np.mean(flat * flat))) if n else 0.0,
        "clipping_frac": float(np.mean(np.abs(flat) >= 32767)) if n else 0.0,
        "peak": int(np.max(np.abs(flat))) if n else 0,
    }
