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
4/4+2, 2/2+1) order. Decode covers the FIRST image frame (animation
frames after it are ignored — the still-image contract the feature
extractors need); unsupported structure raises ``ValueError``
honestly, same policy as the other codecs.

Encode writes a non-interlaced GIF89a with a global palette built
from the image's unique colors (> 256 distinct colors raises — GIF is
palettized by spec; quantization is a modeling choice this engine
refuses to make silently) and a REAL LZW compressor, so
``decode(encode(px))`` round-trips bit-exactly.
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
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
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
    run: tuple[int, ...] = ()
    for idx in indices:
        cand = run + (idx,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        # width grows when the NEXT code would not fit (decoder grows
        # its table one entry behind the encoder)
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = (idx,)
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB array (first image frame)."""
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


def encode_gif(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → GIF89a bytes (non-interlaced,
    global palette from the image's distinct colors; > 256 raises)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    n_colors = palette.shape[0]
    if n_colors > 256:
        raise ValueError(f"GIF is palettized: {n_colors} distinct colors > 256")
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
