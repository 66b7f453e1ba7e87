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


def test_animation_random_sweep_exact():
    """Random multi-frame round trips (codec-sweep policy): frame
    count, per-frame pixels, and delays all bit-exact."""
    rng = np.random.default_rng(7)
    for trial in range(8):
        h, w = int(rng.integers(2, 32)), int(rng.integers(2, 32))
        k = int(rng.integers(1, 6))
        frames = [
            rng.integers(0, 256, size=(h, w)).astype(np.uint8)
            for _ in range(k)
        ]
        delays = [int(rng.integers(1, 500)) for _ in range(k)]
        out = gif.decode_frames(
            gif.encode_animation(frames, delays_cs=delays, loop=trial)
        )
        assert len(out) == k, f"trial {trial}"
        for f, (rgb, d) in enumerate(out):
            assert d == delays[f]
            assert (rgb[..., 0] == frames[f]).all()
            assert (rgb[..., 1] == frames[f]).all()


def test_animation_subrect_transparency_composites():
    """Sub-rectangle frames with a transparent index paint only their
    opaque pixels — the standard web-GIF delta-frame layout."""
    base = np.full((12, 16), 5, dtype=np.uint8)
    patch = np.full((4, 6), 77, dtype=np.uint8)
    patch[1, 2] = 9  # transparent
    out = gif.decode_frames(
        gif.encode_animation([base, (patch, 4, 3, 9)])
    )
    assert len(out) == 2
    f1 = out[1][0][..., 0]
    assert f1[3, 4] == 77          # painted region
    assert f1[4, 6] == 5           # transparent pixel shows base
    assert f1[0, 0] == 5 and f1[11, 15] == 5  # outside region untouched
    # first frame canvas is just the base
    assert (out[0][0][..., 0] == base).all()


def test_animation_disposal_background_and_previous():
    base = np.full((8, 8), 3, dtype=np.uint8)
    patch = np.full((3, 3), 200, dtype=np.uint8)
    tail = np.full((2, 2), 111, dtype=np.uint8)
    # disposal=2: after frame 1 its region restores to the BACKGROUND
    # color (global palette index 0 -> grey 0)
    out2 = gif.decode_frames(
        gif.encode_animation([base, (patch, 2, 2, None), (tail, 0, 0, None)],
                             disposal=2)
    )
    last = out2[2][0][..., 0]
    assert last[3, 3] == 0      # patch region restored to bg
    assert last[0, 0] == 111    # tail painted
    assert last[7, 7] == 0      # base region restored too (disposal on frame 0)
    # per-frame disposal [1, 3, 1]: frame 1 paints the patch then
    # restores the PRE-frame canvas, so frame 2 composites onto base
    out3 = gif.decode_frames(
        gif.encode_animation([base, (patch, 2, 2, None), (tail, 0, 0, None)],
                             disposal=[1, 3, 1])
    )
    last3 = out3[2][0][..., 0]
    assert last3[3, 3] == 3     # patch undone by disposal-3
    assert last3[0, 0] == 111   # tail painted
    assert last3[7, 7] == 3     # base (disposal-1) still in place
    assert (out3[1][0][..., 0][2:5, 2:5] == 200).all()  # frame 1 showed patch


def test_animation_netscape_loop_block_present():
    pay = gif.encode_animation([np.zeros((2, 2), dtype=np.uint8)], loop=42)
    assert b"NETSCAPE2.0" in pay
    i = pay.index(b"NETSCAPE2.0") + 11
    assert pay[i] == 3 and pay[i + 1] == 1
    assert int.from_bytes(pay[i + 2: i + 4], "little") == 42
