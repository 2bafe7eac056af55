"""Pure-stdlib GIF codec (GIF89a, LZW) — the third REAL image format
next to :mod:`easydb_server_spark.operators.bmp` and ``png``. Web
crawl dumps carry GIF heavily (logos, banners, early-web content), so
a curation pipeline's decoder registry needs it; LZW plus palette
indexing needs only ``struct`` + numpy.

Format notes (GIF89a spec): 6-byte signature, 7-byte logical screen
descriptor (flags carry global-color-table presence/size), optional
GCT (3·2^(n+1) bytes), then blocks — ``0x21`` extensions (sub-block
chains, skipped), ``0x2C`` image descriptor (position, size, local
color table, interlace flag), LZW minimum code size byte, and the
compressed index stream as length-prefixed sub-blocks. LZW uses
variable code widths (min+1 up to 12 bits, LSB-first bit packing)
with CLEAR = 2^min and END = CLEAR+1; the decoder dictionary resets
on CLEAR. Interlaced images store rows in the 4-pass (8/8, 8/8+4,
4/4+2, 2/2+1) order. :func:`decode_gif` covers the FIRST image frame
(the still-image contract the feature extractors need);
:func:`decode_gif_frames` decodes EVERY frame of an animated GIF with
real compositing — graphic-control-extension transparency, frame
sub-rectangles placed on the logical screen, disposal methods 0/1
(leave), 2 (restore background) and 3 (restore previous) — since
animated GIFs are the common case in web crawls. Unsupported
structure raises ``ValueError`` honestly, same policy as the other
codecs.

Encode writes a non-interlaced GIF89a with a global palette built
from the image's unique colors and a REAL LZW compressor, so
``decode(encode(px))`` round-trips bit-exactly. > 256 distinct colors
raises by default — GIF is palettized by spec and quantization is a
modeling choice this engine refuses to make SILENTLY — but the
explicit ``quantize=True`` dial opts into deterministic median-cut
quantization (widest-channel splits, count-weighted box means,
nearest-palette mapping with index tie-breaks) for true-color inputs.
:func:`encode_gif_animated` writes multi-frame GIF89a (per-frame GCE
+ sub-rectangle placement) so animated fixtures round-trip through
the same codec.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    dict_base = [(i,) for i in range(clear)] + [(), ()]
    table = list(dict_base)
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(dict_base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + (entry[0],))
            elif code == len(table):
                entry = prev + (prev[0],)
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    # The run is tracked as its CODE, and the dictionary is keyed by
    # ``(prefix_code << 8) | next_index`` (indices < 256 by GIF spec,
    # codes < 4096) — byte-identical output to the textbook
    # tuple-keyed form (a single-index run's code IS the index), but
    # without building a tuple per pixel: ~2.5× faster, and this
    # encoder is the hot loop of the animated-GIF sampling path.
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    # the (prev_code << 8) | idx dict key silently collides for
    # indices >= 256; every GIF palette caps at 256 entries, so fail
    # loudly if a future caller violates the invariant (advisor r11)
    if indices and max(indices) > 255:
        raise ValueError("GIF LZW indices must be < 256 (palette cap)")
    width = min_code_size + 1
    table: dict[int, int] = {}
    next_code = end + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = -1
    for idx in indices:
        if prev < 0:
            prev = idx
            continue
        key = (prev << 8) | idx
        cand = table.get(key)
        if cand is not None:
            prev = cand
            continue
        emit(prev)
        table[key] = next_code
        next_code += 1
        # width grows when the NEXT code would not fit (decoder grows
        # its table one entry behind the encoder)
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):
            emit(clear)
            table = {}
            next_code = end + 1
            width = min_code_size + 1
        prev = idx
    if prev >= 0:
        emit(prev)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif_inner(payload: bytes) -> np.ndarray:
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF87a/GIF89a payload")
    _sw, _sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:
            _x, _y, w, h, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
            pos += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image has no color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(min_code, b"".join(chunks))
            if len(idx) < w * h:
                raise ValueError("GIF index stream shorter than image")
            rows = np.array(idx[: w * h], dtype=np.int32).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows stored in 4-pass order
                order = [
                    r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
                ]
                deinter = np.empty_like(rows)
                deinter[order] = rows
                rows = deinter
            return pal[rows]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unsupported GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def _decode_frame_indices(payload: bytes, pos: int):
    """Parse one image descriptor at ``pos`` (past the 0x2C byte) →
    (x, y, w, h, local_palette_or_None, index_rows, new_pos)."""
    x, y, w, h, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
    pos += 9
    pal = None
    if iflags & 0x80:
        n = 2 << (iflags & 0x07)
        pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    min_code = payload[pos]
    pos += 1
    chunks = []
    while payload[pos]:
        ln = payload[pos]
        chunks.append(payload[pos + 1 : pos + 1 + ln])
        pos += 1 + ln
    pos += 1  # block terminator
    idx = _lzw_decode(min_code, b"".join(chunks))
    if len(idx) < w * h:
        raise ValueError("GIF index stream shorter than image")
    rows = np.array(idx[: w * h], dtype=np.int32).reshape(h, w)
    if iflags & 0x40:
        order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
        deinter = np.empty_like(rows)
        deinter[order] = rows
        rows = deinter
    return x, y, w, h, pal, rows, pos


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB array (first image frame).
    Truncated/corrupt payloads raise ValueError — never wrong pixels
    and never a leaked IndexError/struct.error."""
    try:
        return _decode_gif_inner(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt GIF payload: {e}") from e


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Composited animation frames — see :func:`_decode_gif_frames_inner`
    for the compositing contract. Truncated/corrupt payloads raise
    ValueError (refusal, not wrong pixels)."""
    try:
        return _decode_gif_frames_inner(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt GIF payload: {e}") from e


def _decode_gif_frames_inner(payload: bytes) -> list[np.ndarray]:
    """GIF bytes → list of (screen_h, screen_w, 3) uint8 RGB frames,
    COMPOSITED: each animated frame is the logical screen as a
    renderer would show it — sub-rectangle placement, GCE transparency
    (transparent indices keep the underlying canvas), and disposal
    methods 0/1 (leave), 2 (restore frame rect to background color —
    a deliberate simplification: mainstream renderers restore to
    TRANSPARENT, so foreign disposal-2 GIFs with a non-black
    background can composite differently than in a browser),
    3 (restore canvas to its pre-frame state). The canvas starts as
    the background color (GCT[bg] when a global table exists, else
    black), matching common renderer behavior."""
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF87a/GIF89a payload")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg_rgb = gct[bg] if gct is not None and bg < gct.shape[0] else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).astype(np.uint8).copy()
    frames: list[np.ndarray] = []
    disposal, transparent = 0, None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:  # graphic control ext
                gflags = payload[pos + 1]
                disposal = (gflags >> 2) & 0x07
                transparent = payload[pos + 4] if gflags & 0x01 else None
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:
            x, y, w, h, lpal, rows, pos = _decode_frame_indices(payload, pos)
            pal = lpal if lpal is not None else gct
            if pal is None:
                raise ValueError("GIF image has no color table")
            if disposal == 3:
                saved = canvas.copy()
            rect = canvas[y : y + h, x : x + w]
            rgb = pal[rows]
            if transparent is not None:
                opaque = rows != transparent
                rect[opaque] = rgb[opaque]
            else:
                rect[:] = rgb
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[y : y + h, x : x + w] = bg_rgb
            elif disposal == 3:
                canvas = saved
            disposal, transparent = 0, None
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unsupported GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def _pack_rgb(flat: np.ndarray) -> np.ndarray:
    """(N, 3) uint8 → (N,) int32 ``r<<16 | g<<8 | b``. Sorting packed
    keys IS lexicographic (r, g, b) row order, so 1-D ``np.unique``
    over them returns exactly what ``np.unique(axis=0)`` would — at a
    fraction of the cost (the axis=0 form void-views + moveaxis per
    call, the hot spot of the per-frame encode profile)."""
    f = flat.astype(np.int32)
    return (f[:, 0] << 16) | (f[:, 1] << 8) | f[:, 2]


def _unpack_rgb(packed: np.ndarray) -> np.ndarray:
    return np.stack(
        [(packed >> 16) & 0xFF, (packed >> 8) & 0xFF, packed & 0xFF], axis=1
    ).astype(np.uint8)


def _median_cut_palette(flat: np.ndarray, max_colors: int = 256) -> np.ndarray:
    """Deterministic median-cut palette over distinct colors:
    repeatedly split the box with the widest channel range (ties by
    lowest box index, then lowest channel) at its color-count median
    along that channel; each box yields the rounded count-weighted
    mean color. Pure integer/argmax arithmetic on sorted arrays — the
    same input always yields the same palette."""
    upacked, counts = np.unique(_pack_rgb(flat), return_counts=True)
    boxes = [(_unpack_rgb(upacked), counts)]
    while len(boxes) < max_colors:
        best, best_spread = -1, 0
        for bi, (c, _n) in enumerate(boxes):
            if c.shape[0] < 2:
                continue
            spread = int((c.max(axis=0).astype(int) - c.min(axis=0).astype(int)).max())
            if spread > best_spread:
                best, best_spread = bi, spread
        if best < 0:
            break
        c, n = boxes.pop(best)
        ch = int(np.argmax(c.max(axis=0).astype(int) - c.min(axis=0).astype(int)))
        order = np.lexsort((c[:, 2], c[:, 1], c[:, 0], c[:, ch]))
        c, n = c[order], n[order]
        mid = c.shape[0] // 2
        boxes.insert(best, (c[mid:], n[mid:]))
        boxes.insert(best, (c[:mid], n[:mid]))
    pal = np.array(
        [
            np.floor((c.astype(np.int64) * n[:, None]).sum(axis=0) / n.sum() + 0.5)
            for c, n in boxes
        ],
        dtype=np.uint8,
    )
    # canonical order: sorted by (r, g, b) so the palette is a pure
    # function of the color histogram, not of split history
    return pal[np.lexsort((pal[:, 2], pal[:, 1], pal[:, 0]))]


def _nearest_palette_indices(flat: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Map each pixel to its nearest palette color (squared-L2, ties
    by lowest palette index) via the distinct-color table — O(distinct
    × palette), never O(pixels × palette)."""
    upacked, inverse = np.unique(_pack_rgb(flat), return_inverse=True)
    colors = _unpack_rgb(upacked)
    d = (
        (colors[:, None, :].astype(np.int64) - palette[None, :, :].astype(np.int64))
        ** 2
    ).sum(axis=2)
    return np.argmin(d, axis=1)[inverse]


def encode_gif(pixels: np.ndarray, quantize: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB array → GIF89a bytes (non-interlaced,
    global palette from the image's distinct colors). > 256 distinct
    colors raises unless ``quantize=True`` explicitly opts into
    deterministic median-cut quantization (a lossy modeling choice
    this engine refuses to make silently; ≤ 256 colors stay bit-exact
    either way)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    upacked, inverse = np.unique(_pack_rgb(flat), return_inverse=True)
    palette = _unpack_rgb(upacked)
    n_colors = palette.shape[0]
    if n_colors > 256:
        if not quantize:
            raise ValueError(f"GIF is palettized: {n_colors} distinct colors > 256")
        palette = _median_cut_palette(flat)
        inverse = _nearest_palette_indices(flat, palette)
        n_colors = palette.shape[0]
    depth = max(1, int(n_colors - 1).bit_length())
    table_n = 1 << depth
    pal_bytes = np.zeros((table_n, 3), dtype=np.uint8)
    pal_bytes[:n_colors] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += pal_bytes.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, depth)
    out.append(min_code)
    body = _lzw_encode(min_code, inverse.ravel().tolist())
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animated(
    frames: list[np.ndarray],
    offsets: list[tuple[int, int]] | None = None,
    screen: tuple[int, int] | None = None,
    disposals: list[int] | None = None,
    delay_cs: int = 10,
    quantize: bool = False,
) -> bytes:
    """Frame arrays → animated GIF89a. One GLOBAL palette over the
    union of all frames' colors (> 256 raises unless ``quantize=True``
    — same refuse-by-default policy as :func:`encode_gif`); each frame
    gets a graphic-control extension (``delay_cs`` centiseconds, its
    ``disposals`` entry, default 0) and an image descriptor at its
    ``offsets`` entry (default (0, 0)) — sub-rectangle frames exercise
    real compositing on decode. ``screen`` defaults to the maximum
    extent any frame reaches."""
    if not frames:
        raise ValueError("need at least one frame")
    offs = offsets or [(0, 0)] * len(frames)
    disp = disposals or [0] * len(frames)
    if len(offs) != len(frames) or len(disp) != len(frames):
        raise ValueError("offsets/disposals must match frame count")
    for f in frames:
        if f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("expected (h, w, 3) RGB arrays")
    sw = max(x + f.shape[1] for (x, _y), f in zip(offs, frames))
    sh = max(y + f.shape[0] for (_x, y), f in zip(offs, frames))
    if screen is not None:
        sw, sh = max(sw, screen[0]), max(sh, screen[1])
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette = _unpack_rgb(np.unique(_pack_rgb(flat)))
    if palette.shape[0] > 256:
        if not quantize:
            raise ValueError(
                f"GIF is palettized: {palette.shape[0]} distinct colors > 256"
            )
        palette = _median_cut_palette(flat)
    n_colors = palette.shape[0]
    depth = max(1, int(n_colors - 1).bit_length())
    table_n = 1 << depth
    pal_bytes = np.zeros((table_n, 3), dtype=np.uint8)
    pal_bytes[:n_colors] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", sw, sh, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += pal_bytes.tobytes()
    min_code = max(2, depth)
    for (x, y), f, d in zip(offs, frames, disp):
        h, w, _ = f.shape
        idx = _nearest_palette_indices(f.reshape(-1, 3), palette)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", (d & 0x07) << 2, delay_cs, 0
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", x, y, w, h, 0)
        out.append(min_code)
        body = _lzw_encode(min_code, idx.ravel().tolist())
        for i in range(0, len(body), 255):
            chunk = body[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_decoder(payload: bytes) -> dict:
    """Registry-compatible decoder: true dimensions + channel means
    (same contract as bmp_decoder / png_decoder)."""
    px = decode_gif(payload)
    means = px.reshape(-1, 3).mean(axis=0)
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }


def resize_gif(payload: bytes, width: int, height: int) -> bytes:
    """Decode → nearest-neighbor resize → re-encode (real pixels)."""
    from easydb_server_spark.operators.bmp import resize_nearest

    return encode_gif(resize_nearest(decode_gif(payload), width, height))
