"""GIF codec (operators/gif.py): LZW round-trips, interlace, palette
limits, and the Arrow-pipeline resize path — pytest-locked like the
BMP/PNG codecs, with the pixel-faithfulness of the encoder/decoder
pair additionally oracled by the multimodal_gif conformance entry."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from easydb_server_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_decoder,
    resize_gif,
)
from easydb_server_spark.operators.gif import _INTERLACE_PASSES


def test_roundtrip_palettized():
    rng = np.random.RandomState(7)
    pal = rng.randint(0, 256, (13, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 13, (23, 31))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_gradient_and_extremes():
    g = np.zeros((16, 16, 3), dtype=np.uint8)
    g[..., 0] = np.arange(16)[:, None] * 16
    g[..., 1] = np.arange(16)[None, :] * 16
    assert np.array_equal(decode_gif(encode_gif(g)), g)
    solid = np.full((9, 9, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(solid)), solid)
    one = np.full((1, 1, 3), 255, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(one)), one)


def test_too_many_colors_raises():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1000 distinct
    with pytest.raises(ValueError, match="palettized"):
        encode_gif(img)


def test_not_a_gif_raises():
    with pytest.raises(ValueError):
        decode_gif(b"BM not a gif at all")


def test_interlaced_decode():
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (13, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 13, (23, 31))]
    h = img.shape[0]
    order = [r for s, step in _INTERLACE_PASSES for r in range(s, h, step)]
    encoded = bytearray(encode_gif(img[order]))  # rows in pass order
    pos = 13 + 3 * 16  # header + 16-entry GCT (13 colors -> depth 4)
    assert encoded[pos] == 0x2C
    encoded[pos + 9] |= 0x40  # set the interlace flag
    assert np.array_equal(decode_gif(bytes(encoded)), img)


def test_lzw_width_growth_and_table_reset():
    idx = [3] * 5000 + [1, 2, 0] * 3000  # forces 12-bit growth + CLEAR reset
    assert _lzw_decode(2, _lzw_encode(2, idx)) == idx


@settings(max_examples=40, deadline=None)
@given(
    st.integers(2, 30),
    st.integers(2, 30),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
def test_roundtrip_fuzz(h, w, n_colors, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (n_colors, 3), dtype=np.uint8)
    img = pal[rng.randint(0, n_colors, (h, w))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_decoder_dict_contract():
    img = np.full((4, 6, 3), 100, dtype=np.uint8)
    feats = gif_decoder(encode_gif(img))
    assert feats == {
        "width": 6, "height": 4, "mean_r": 100.0, "mean_g": 100.0, "mean_b": 100.0,
    }


def test_resize_real_pixels():
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (8, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 8, (20, 20))]
    small = decode_gif(resize_gif(encode_gif(img), 5, 4))
    assert small.shape == (4, 5, 3)
    # nearest-neighbor: every output pixel is some input pixel
    flat_in = {tuple(p) for p in img.reshape(-1, 3)}
    assert all(tuple(p) in flat_in for p in small.reshape(-1, 3))


def test_resize_images_gif_codec_path(spark):
    from easydb_server_spark.operators.multimodal import resize_images

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (4, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 4, (12, 10))]
    df = spark.createDataFrame([(1, bytearray(encode_gif(img)))], ["item_id", "payload"])
    (row,) = resize_images(df, "payload", "item_id", 5, 6, codec="gif").collect()
    assert (row.width, row.height) == (5, 6)
    assert decode_gif(bytes(row.payload)).shape == (6, 5, 3)


# ---------------- animated GIF (r11): multi-frame decode ----------------

from easydb_server_spark.operators.gif import (  # noqa: E402
    decode_gif_frames,
    encode_gif_animated,
)


def _pal16():
    return np.array(
        [[(i * 16) % 256, (i * 37) % 256, (i * 73) % 256] for i in range(16)],
        dtype=np.uint8,
    )


def test_animated_roundtrip_full_frames():
    pal = _pal16()
    y, x = np.mgrid[0:6, 0:8]
    frames = [pal[(f * 3 + y * 5 + x * 7) % 16] for f in range(5)]
    dec = decode_gif_frames(encode_gif_animated(frames))
    assert len(dec) == 5
    for a, b in zip(frames, dec):
        assert (a == b).all()
    # single-frame decode keeps its first-frame contract
    assert (decode_gif(encode_gif_animated(frames)) == frames[0]).all()


def test_subrectangle_frames_composite_over_canvas():
    pal = _pal16()
    base = pal[(np.arange(48) % 16)].reshape(6, 8, 3)
    patch = pal[np.full((2, 3), 5)]
    dec = decode_gif_frames(
        encode_gif_animated([base, patch], offsets=[(0, 0), (2, 1)])
    )
    want = base.copy()
    want[1:3, 2:5] = pal[5]
    assert (dec[0] == base).all()
    assert (dec[1] == want).all()


def test_disposal_2_restores_background_between_frames():
    pal = _pal16()
    patch = pal[np.full((2, 2), 7)]
    dec = decode_gif_frames(
        encode_gif_animated(
            [patch, patch], offsets=[(1, 1), (4, 3)], screen=(8, 6), disposals=[2, 0]
        )
    )
    bg = dec[0][0, 0]  # background = palette[0]
    # frame 2: the first patch's rect was restored to background
    assert (dec[1][1:3, 1:3] == bg).all()
    assert (dec[1][3:5, 4:6] == pal[7]).all()


def test_disposal_3_restores_previous_canvas():
    pal = _pal16()
    base = pal[np.full((4, 4), 2)]
    overlay = pal[np.full((2, 2), 9)]
    final = pal[np.full((1, 1), 11)]
    dec = decode_gif_frames(
        encode_gif_animated(
            [base, overlay, final],
            offsets=[(0, 0), (1, 1), (0, 0)],
            disposals=[0, 3, 0],
        )
    )
    # frame 2 shows the overlay; frame 3's canvas reverted to frame 1
    assert (dec[1][1:3, 1:3] == pal[9]).all()
    assert (dec[2][1:3, 1:3] == pal[2]).all()
    assert (dec[2][0, 0] == pal[11]).all()


def test_quantize_dial_roundtrip_and_determinism():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 40, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="distinct colors > 256"):
        encode_gif(img)
    payload = encode_gif(img, quantize=True)
    assert payload == encode_gif(img, quantize=True)  # deterministic
    dec = decode_gif(payload)
    assert dec.shape == img.shape
    assert len(np.unique(dec.reshape(-1, 3), axis=0)) <= 256
    # quantization error bounded: median-cut on uniform noise stays
    # within a coarse per-channel budget (empirically ~9)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 20
    # <=256 distinct colors stays bit-exact even with the dial on
    pal = _pal16()
    small = pal[(np.arange(35) % 16)].reshape(5, 7, 3)
    assert (decode_gif(encode_gif(small, quantize=True)) == small).all()


def test_sample_frames_decodes_real_gif_frames(spark):
    import pyspark.sql.functions as F

    from easydb_server_spark.operators.gif import gif_decoder
    from easydb_server_spark.operators.multimodal import sample_frames

    pal = _pal16()
    y, x = np.mgrid[0:6, 0:8]
    frames = [pal[(f * 3 + y * 5 + x * 7) % 16] for f in range(6)]
    blob = encode_gif_animated(frames)
    df = spark.createDataFrame([(1, bytearray(blob))], "item_id long, payload binary")
    out = sample_frames(df, "payload", "item_id", 3).collect()
    assert [r.frame_idx for r in out] == [0, 1, 2]
    # frame i samples animation frame i*6//3 = 0, 2, 4 — pixel-exact
    for r, f in zip(out, (0, 2, 4)):
        assert (decode_gif(bytes(r.frame)) == frames[f]).all()
        feats = gif_decoder(bytes(r.frame))
        assert (feats["width"], feats["height"]) == (8, 6)
    # non-GIF payloads keep the byte-slice stub
    stub = spark.createDataFrame(
        [(2, bytearray(b"0123456789ab"))], "item_id long, payload binary"
    )
    rows = sample_frames(stub, "payload", "item_id", 3).collect()
    assert [bytes(r.frame) for r in rows] == [b"0123", b"4567", b"89ab"]


def test_sample_frame_features_matches_composed_chain(spark):
    """The fused sampler+feature operator (r16, guide §4 boundary
    elimination) must be value-identical to sample_frames followed by
    a per-frame gif_decoder map — same codec calls, same rounding."""
    from easydb_server_spark.operators.gif import gif_decoder
    from easydb_server_spark.operators.multimodal import (
        sample_frame_features,
        sample_frames,
    )

    rng = np.random.default_rng(23)
    rows = []
    for item_id in (1, 2):
        # >256 colors so the re-encode exercises the quantize path too
        frames = [
            rng.integers(0, 256, size=(10, 14, 3)).astype(np.uint8) for _ in range(5)
        ]
        rows.append((item_id, bytearray(encode_gif_animated(frames, quantize=True))))
    df = spark.createDataFrame(rows, "item_id long, payload binary")

    fused = sorted(
        tuple(r) for r in sample_frame_features(df, "payload", "item_id", 3).collect()
    )
    composed = []
    for r in sample_frames(df, "payload", "item_id", 3).collect():
        f = gif_decoder(bytes(r.frame))
        composed.append(
            (
                r.item_id,
                r.frame_idx,
                f["width"],
                f["height"],
                round(f["mean_r"], 4),
                round(f["mean_g"], 4),
                round(f["mean_b"], 4),
            )
        )
    assert fused == sorted(composed)


def test_local_color_table_overrides_global():
    """A frame carrying its own local color table must decode through
    it, not the global one (hand-built payload: the encoder always
    writes a global table, so this exercises the decoder-only path)."""
    import struct

    from easydb_server_spark.operators.gif import _lzw_encode

    def img_block(x, y, w, h, indices, local_pal=None):
        out = bytearray()
        iflags = 0
        if local_pal is not None:
            n = len(local_pal)
            depth = max(1, (n - 1).bit_length())
            iflags = 0x80 | (depth - 1)
        out += b"\x2c" + struct.pack("<HHHHB", x, y, w, h, iflags)
        if local_pal is not None:
            table_n = 1 << depth
            padded = list(local_pal) + [(0, 0, 0)] * (table_n - len(local_pal))
            out += bytes(v for rgb in padded for v in rgb)
        out.append(2)  # min code size
        body = _lzw_encode(2, indices)
        for i in range(0, len(body), 255):
            chunk = body[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
        return out

    red, green, blue, yellow = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)
    payload = bytearray(b"GIF89a")
    payload += struct.pack("<HHBBB", 4, 4, 0x80 | 0, 0, 0)  # GCT size field 0 -> 2 colors
    payload += bytes(v for rgb in (red, green) for v in rgb)
    payload += img_block(0, 0, 4, 4, [0] * 16)  # global palette: red
    payload += img_block(0, 0, 4, 4, [1] * 16, local_pal=[blue, yellow])
    payload += b"\x3b"
    frames = decode_gif_frames(bytes(payload))
    assert len(frames) == 2
    assert (frames[0] == np.array(red, dtype=np.uint8)).all()
    assert (frames[1] == np.array(yellow, dtype=np.uint8)).all()
