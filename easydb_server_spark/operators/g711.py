"""ITU-T G.711 companding (mu-law / A-law) — pure numpy, from the
published spec. Telephony and call-center corpora ship as 8-bit
G.711-companded WAV (format tags 6/7) far more often than linear PCM;
this module gives the audio pipeline the compress/expand halves so
those corpora normalize into the engine's canonical int16 form.

Both laws quantize 16-bit linear PCM onto 8 logarithmic segments with
a 4-bit mantissa (so decode(encode(s)) is a deterministic staircase —
closed-form integer arithmetic an independent SQL oracle can replay).
The mu-law compressor is the classic bias-132 formulation; A-law is
the 13-bit segmented form with the 0x55 toggle mask. All operations
are vectorized integer/shift arithmetic; floor(log2) at exact powers
of two is exact in float64, so the segment search never wobbles.
"""

from __future__ import annotations

import numpy as np

_MU_BIAS = 0x84  # 132
_MU_CLIP = 32635


def mulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> mu-law bytes (uint8), G.711 table 2a."""
    x = samples.astype(np.int32)
    sign = x < 0
    mag = np.where(sign, -x, x)
    mag = np.minimum(mag, _MU_CLIP) + _MU_BIAS
    exp = np.floor(np.log2(mag)).astype(np.int32) - 7
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    u = np.where(sign, 0x80, 0).astype(np.int32) | (exp << 4) | mant
    return (~u & 0xFF).astype(np.uint8)


def mulaw_expand(data: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16 linear PCM (the staircase midpoints)."""
    u = (~data.astype(np.int32)) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    t = (((mant << 3) + _MU_BIAS) << exp) - _MU_BIAS
    return np.where(sign, -t, t).astype(np.int16)


_A_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def alaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> A-law bytes (uint8), G.711 table 1a
    (13-bit segmented form, 0x55 even-bit toggle)."""
    x = samples.astype(np.int32) >> 3  # 13-bit magnitude domain
    mask = np.where(x >= 0, 0xD5, 0x55).astype(np.int32)
    pcm = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_A_SEG_END, pcm)  # 0..8
    low = (pcm >> 1) & 0x0F
    high = (pcm >> np.minimum(seg, 7)) & 0x0F
    aval = np.where(seg >= 8, 0x7F, (np.minimum(seg, 7) << 4) | np.where(seg < 2, low, high))
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def alaw_expand(data: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear PCM (segment midpoints). After the
    0x55 toggle, a SET sign bit means positive (G.711 polarity)."""
    a = (data.astype(np.int32) ^ 0x55) & 0xFF
    seg = (a >> 4) & 0x07
    mant = a & 0x0F
    t = (mant << 4) + 8
    t = np.where(seg > 0, (t + 0x100) << np.maximum(seg - 1, 0), t)
    return np.where((a & 0x80) != 0, t, -t).astype(np.int16)


def g711_roundtrip(samples: np.ndarray, law: str) -> np.ndarray:
    """decode(encode(s)) — the staircase a companded corpus actually
    carries. ``law`` is 'mulaw' or 'alaw'."""
    if law == "mulaw":
        return mulaw_expand(mulaw_compress(samples))
    if law == "alaw":
        return alaw_expand(alaw_compress(samples))
    raise ValueError(f"unknown companding law: {law!r} (mulaw|alaw)")
