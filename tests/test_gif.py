"""GIF codec: exact round trips on RANDOM content (the codec-sweep
policy — targeted vectors alone missed the JPEG zigzag bug), interlace
row order, palette handling, LZW dictionary growth + reset, and the
multimodal dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from march_mania_spark_lakehouse_spark.operators import gif, multimodal


def test_random_content_sweep_exact():
    rng = np.random.default_rng(20260815)
    for trial in range(12):
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 48))
        n_colors = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
        px = rng.integers(0, n_colors, size=(h, w)).astype(np.uint8)
        interlace = bool(rng.integers(0, 2))
        decoded = gif.decode(gif.encode(px, pal, interlace=interlace))
        assert decoded.shape == (h, w, 3), f"trial {trial}"
        assert (decoded == pal[px]).all(), f"trial {trial} diverged"


def test_interlace_row_order_differs_but_decodes_equal():
    px = (np.arange(16 * 9, dtype=np.uint8).reshape(9, 16) * 3) % 251
    plain = gif.encode(px, interlace=False)
    inter = gif.encode(px, interlace=True)
    assert plain != inter  # different row stream
    assert (gif.decode(plain) == gif.decode(inter)).all()
    assert (gif.decode(inter)[..., 1] == px).all()


def test_lzw_width_growth_and_dict_reset():
    # big random image forces 12-bit codes and ≥1 CLEAR reset
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(120, 400)).astype(np.uint8)
    decoded = gif.decode(gif.encode(px))
    assert (decoded[..., 0] == px).all()
    # tiny palette exercises small min-code-size path
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    bw = rng.integers(0, 2, size=(20, 20)).astype(np.uint8)
    assert (gif.decode(gif.encode(bw, pal)) == pal[bw]).all()


def test_decode_real_dispatches_gif():
    px = np.full((7, 11), 129, dtype=np.uint8)
    fmt, w, h, feat = multimodal.decode_real(gif.encode(px))
    assert (fmt, w, h) == ("gif", 11, 7)
    assert feat.shape == (8,)


def test_malformed_gif_refuses():
    with pytest.raises(ValueError):
        gif.decode(b"GIF89a" + b"\x00" * 8)
    with pytest.raises(ValueError):
        gif.decode(b"not a gif at all")
