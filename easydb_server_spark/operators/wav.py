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
word-aligned: an odd-sized chunk is followed by one pad byte. Only
integer PCM (format tag 1), 16-bit, is supported; anything else
raises ``ValueError`` (honest failure, same policy as the BMP/PNG
codecs' unsupported variants).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 array → RIFF/WAVE PCM bytes."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("expected (n,) or (n, channels) samples")
    n, channels = samples.shape
    block_align = channels * 2
    fmt_body = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    data_body = samples.astype("<i2").tobytes()
    chunks = b"".join(
        struct.pack("<4sI", tag, len(body)) + body + (b"\x00" if len(body) % 2 else b"")
        for tag, body in ((b"fmt ", fmt_body), (b"data", data_body))
    )
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → ((n, channels) int16 array, sample_rate).

    Walks the chunk list (so extra chunks like ``LIST``/``cue `` are
    skipped, not fatal); requires a PCM ``fmt `` chunk before
    ``data``. Truncated or non-PCM payloads raise ``ValueError``.
    """
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
    if format_tag != 1 or bits != 16:
        raise ValueError(
            f"only 16-bit integer PCM supported (format={format_tag}, bits={bits})"
        )
    if channels < 1:
        raise ValueError("channel count must be >= 1")
    frame = channels * 2
    n = len(data) // frame
    arr = np.frombuffer(data, dtype="<i2", count=n * channels).reshape(n, channels)
    return arr.astype(np.int16), sample_rate


def resample_wav(payload: bytes, target_rate: int) -> bytes:
    """Decode → nearest-sample rate conversion → re-encode (real
    samples) — the audio analogue of the image codecs' nearest-neighbor
    resize: index arithmetic only (output frame i reads input frame
    ``i·in_rate//out_rate``), no interpolation libraries. Preserves
    channel count; duration is preserved to within one frame.
    """
    samples, rate = decode_wav(payload)
    if target_rate <= 0:
        raise ValueError("target_rate must be positive")
    n_out = max(samples.shape[0] * target_rate // rate, 1) if samples.shape[0] else 0
    idx = (np.arange(n_out) * rate) // target_rate
    return encode_wav(samples[idx], target_rate)


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
    samples, rate = decode_wav(payload)
    flat = samples.astype(np.float64).ravel()
    n = flat.size
    return {
        "sample_rate": int(rate),
        "n_channels": int(samples.shape[1]),
        "n_samples": int(samples.shape[0]),
        "duration_ms": int(samples.shape[0] * 1000 // rate) if rate else 0,
        "rms": float(np.sqrt(np.mean(flat * flat))) if n else 0.0,
        "clipping_frac": float(np.mean(np.abs(flat) >= 32767)) if n else 0.0,
        "peak": int(np.max(np.abs(flat))) if n else 0,
    }
