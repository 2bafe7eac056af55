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
