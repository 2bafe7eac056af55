"""Pure-numpy 24-bit BMP codec — a REAL media codec for the multimodal
pipeline (no external decode libraries exist in this container, but
uncompressed BMP needs only struct + numpy, both available).

This upgrades the multimodal story from "plumbing real, decode
stubbed" to "plumbing real, one codec real": `bmp_decoder` plugs into
:func:`easydb_server_spark.operators.multimodal.register_decoder`, so
`binary_features` extracts true dimensions and channel statistics from
genuine image bytes inside the Arrow-batched `mapInPandas` workers,
and `resize_bmp` is an actual nearest-neighbor pixel resample
(re-encoded as BMP) rather than a byte-truncation stand-in. PIL/ffmpeg
would register the same way for JPEG/PNG/video.

Format notes (BITMAPINFOHEADER, BI_RGB): 14-byte file header +
40-byte info header; pixel rows bottom-up, BGR byte order, each row
padded to a 4-byte boundary.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = "<2sIHHI"  # magic, file size, 2x reserved, pixel offset
_INFO_HDR = "<IiiHHIIiiII"


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit uncompressed BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    padded = np.zeros((h, row_size), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    padded[:, : w * 3] = bgr.reshape(h, w * 3)
    body = padded.tobytes()
    pixel_offset = 14 + 40
    file_hdr = struct.pack(_FILE_HDR, b"BM", pixel_offset + len(body), 0, 0, pixel_offset)
    info_hdr = struct.pack(_INFO_HDR, 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB array."""
    magic, _size, _r1, _r2, offset = struct.unpack_from(_FILE_HDR, payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * row_size, offset=offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR → RGB
    return rgb[::-1] if bottom_up else rgb


def bmp_decoder(payload: bytes) -> dict:
    """Registry-compatible decoder: true dimensions + channel means.

    Plug in with ``register_decoder("image", bmp_decoder)`` — runs
    inside the Arrow-batched mapInPandas workers, vectorized numpy per
    image, no driver involvement.
    """
    px = decode_bmp(payload)
    means = px.reshape(-1, 3).mean(axis=0)
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample — index arithmetic only, no interp
    libraries; the resample real pipelines run before feature models
    when exactness matters more than smoothing."""
    h, w, _ = pixels.shape
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return pixels[yi][:, xi]


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """Decode → nearest-neighbor resize → re-encode (real pixels)."""
    return encode_bmp(resize_nearest(decode_bmp(payload), width, height))
