"""Animated-GIF edge fuzz (VERDICT r11 ask #8): interlaced frames
INSIDE animations and local-palette frames mixed with global-palette
frames — both real-crawl shapes the encoder itself never emits, so the
payloads are hand-built from the GIF89a spec and the expected canvases
come from an INDEPENDENT reference compositor implemented here (plain
spec-following numpy, no shared code with operators/gif.py).

Refusal paths stay explicit ValueErrors: a truncated LZW stream inside
an animation must raise, never return wrong pixels.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from easydb_server_spark.operators.gif import _lzw_encode, decode_gif_frames

_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    return [r for start, step in _PASSES for r in range(start, h, step)]


def _palette_block(pal: np.ndarray) -> tuple[bytes, int]:
    """(padded table bytes, depth) for an (n,3) palette."""
    n = pal.shape[0]
    depth = max(1, int(n - 1).bit_length())
    table_n = 1 << depth
    padded = np.zeros((table_n, 3), dtype=np.uint8)
    padded[:n] = pal
    return padded.tobytes(), depth


def _build_animation(screen, bg_index, gpal, frames):
    """Hand-build a GIF89a.

    ``frames``: list of dicts with keys
      x, y, idx (h,w int array), pal (local palette or None),
      interlaced (bool), disposal (int), transparent (int or None)
    """
    sw, sh = screen
    out = bytearray(b"GIF89a")
    gbytes, gdepth = _palette_block(gpal)
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (gdepth - 1), bg_index, 0)
    out += gbytes
    for fr in frames:
        gflags = (fr["disposal"] & 0x07) << 2
        tindex = 0
        if fr["transparent"] is not None:
            gflags |= 0x01
            tindex = fr["transparent"]
        out += b"\x21\xf9\x04" + bytes([gflags, 10, 0, tindex]) + b"\x00"
        idx = fr["idx"]
        h, w = idx.shape
        iflags = 0
        body_pal = b""
        depth_for_codes = gdepth
        if fr["pal"] is not None:
            body_pal, ldepth = _palette_block(fr["pal"])
            iflags |= 0x80 | (ldepth - 1)
            depth_for_codes = ldepth
        rows = idx
        if fr["interlaced"]:
            iflags |= 0x40
            rows = idx[_interlace_order(h)]  # stored in pass order
        out += b"\x2c" + struct.pack("<HHHHB", fr["x"], fr["y"], w, h, iflags)
        out += body_pal
        min_code = max(2, depth_for_codes)
        out.append(min_code)
        data = _lzw_encode(min_code, [int(v) for v in rows.ravel()])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _reference_composite(screen, bg_index, gpal, frames):
    """Spec-following reference compositor (independent of gif.py):
    canvas starts at the background color; each frame paints its
    sub-rect through its own palette honoring transparency, the
    snapshot is appended, then disposal 2 restores the rect to the
    background color and disposal 3 restores the pre-frame canvas
    (matching the decoder's documented disposal-2 simplification)."""
    sw, sh = screen
    bg = gpal[bg_index] if bg_index < gpal.shape[0] else np.zeros(3, np.uint8)
    canvas = np.tile(bg, (sh, sw, 1)).astype(np.uint8)
    outs = []
    for fr in frames:
        pal = fr["pal"] if fr["pal"] is not None else gpal
        idx = fr["idx"]
        h, w = idx.shape
        x, y = fr["x"], fr["y"]
        before = canvas.copy()
        region = canvas[y : y + h, x : x + w]
        mask = np.ones((h, w), dtype=bool)
        if fr["transparent"] is not None:
            mask = idx != fr["transparent"]
        safe_idx = np.minimum(idx, pal.shape[0] - 1)
        region[mask] = pal[safe_idx][mask]
        outs.append(canvas.copy())
        if fr["disposal"] == 2:
            canvas[y : y + h, x : x + w] = bg
        elif fr["disposal"] == 3:
            canvas = before
    return outs


def _rand_palette(rng, n):
    # distinct colors so index->color is unambiguous
    vals = rng.choice(256**3, size=n, replace=False)
    return np.stack([vals >> 16, (vals >> 8) & 0xFF, vals & 0xFF], axis=1).astype(
        np.uint8
    )


def test_interlaced_frame_inside_animation():
    rng = np.random.RandomState(5)
    gpal = _rand_palette(rng, 7)
    frames = [
        dict(x=0, y=0, idx=rng.randint(0, 7, (20, 16)), pal=None,
             interlaced=False, disposal=0, transparent=None),
        dict(x=3, y=2, idx=rng.randint(0, 7, (13, 9)), pal=None,
             interlaced=True, disposal=0, transparent=None),
        dict(x=0, y=6, idx=rng.randint(0, 7, (9, 16)), pal=None,
             interlaced=True, disposal=2, transparent=None),
    ]
    payload = _build_animation((16, 20), 1, gpal, frames)
    got = decode_gif_frames(payload)
    want = _reference_composite((16, 20), 1, gpal, frames)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_local_palette_frames_mixed_with_global():
    rng = np.random.RandomState(9)
    gpal = _rand_palette(rng, 5)
    lpal1 = _rand_palette(rng, 11)
    lpal2 = _rand_palette(rng, 3)
    frames = [
        dict(x=0, y=0, idx=rng.randint(0, 5, (12, 12)), pal=None,
             interlaced=False, disposal=0, transparent=None),
        dict(x=2, y=3, idx=rng.randint(0, 11, (6, 7)), pal=lpal1,
             interlaced=False, disposal=0, transparent=None),
        dict(x=1, y=1, idx=rng.randint(0, 3, (5, 5)), pal=lpal2,
             interlaced=True, disposal=3, transparent=2),
        dict(x=4, y=0, idx=rng.randint(0, 5, (8, 6)), pal=None,
             interlaced=False, disposal=0, transparent=0),
    ]
    payload = _build_animation((12, 12), 0, gpal, frames)
    got = decode_gif_frames(payload)
    want = _reference_composite((12, 12), 0, gpal, frames)
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert np.array_equal(g, w), f"frame {i}"


@pytest.mark.parametrize("seed", range(12))
def test_animation_fuzz_interlace_palettes_disposals(seed):
    rng = np.random.RandomState(100 + seed)
    sw, sh = rng.randint(8, 40), rng.randint(8, 40)
    gpal = _rand_palette(rng, rng.randint(2, 32))
    frames = []
    for _ in range(rng.randint(1, 6)):
        local = rng.rand() < 0.5
        pal = _rand_palette(rng, rng.randint(2, 32)) if local else None
        ncol = pal.shape[0] if local else gpal.shape[0]
        w = rng.randint(1, sw + 1)
        h = rng.randint(1, sh + 1)
        frames.append(
            dict(
                x=rng.randint(0, sw - w + 1),
                y=rng.randint(0, sh - h + 1),
                idx=rng.randint(0, ncol, (h, w)),
                pal=pal,
                interlaced=bool(rng.rand() < 0.5),
                disposal=int(rng.randint(0, 4)),
                transparent=int(rng.randint(0, ncol)) if rng.rand() < 0.4 else None,
            )
        )
    bg = int(rng.randint(0, gpal.shape[0]))
    payload = _build_animation((sw, sh), bg, gpal, frames)
    got = decode_gif_frames(payload)
    want = _reference_composite((sw, sh), bg, gpal, frames)
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert np.array_equal(g, w), f"seed {seed} frame {i}"


def test_truncated_animation_raises_not_wrong_pixels():
    rng = np.random.RandomState(2)
    gpal = _rand_palette(rng, 4)
    frames = [
        dict(x=0, y=0, idx=rng.randint(0, 4, (10, 10)), pal=None,
             interlaced=True, disposal=0, transparent=None),
    ]
    payload = _build_animation((10, 10), 0, gpal, frames)
    for cut in (5, 12, 20, 40):
        with pytest.raises(ValueError):
            decode_gif_frames(payload[: len(payload) - cut])
