"""Unit tests for color, tiling, zig-zag, quantization, DPCM and subsampling ops."""

import numpy as np
import pytest

from jpeg_tpu import tables
from jpeg_tpu.config import Subsampling
from jpeg_tpu.ops import color, dpcm, quant, subsample, tile, zigzag


# ---------------------------------------------------------------------------
# Color
# ---------------------------------------------------------------------------


def test_color_known_values():
    # White, black, pure red (BT.601 full-range).
    rgb = np.array([[255, 255, 255], [0, 0, 0], [255, 0, 0]], dtype=np.float32)
    ycc = np.asarray(color.rgb_to_ycbcr(rgb))
    np.testing.assert_allclose(ycc[0], [255.0, 128.0, 128.0], atol=1e-3)
    np.testing.assert_allclose(ycc[1], [0.0, 128.0, 128.0], atol=1e-3)
    np.testing.assert_allclose(ycc[2], [76.245, 84.972, 255.5], atol=0.01)


def test_color_cb_sign():
    """Blue must push Cb UP (the reference's Cb formula has a sign bug,
    src/preprocess.c:161 — SURVEY.md component 4)."""
    blue = np.array([[0.0, 0.0, 255.0]], dtype=np.float32)
    ycc = np.asarray(color.rgb_to_ycbcr(blue))
    assert ycc[0, 1] > 250  # Cb near max
    green = np.array([[0.0, 255.0, 0.0]], dtype=np.float32)
    assert np.asarray(color.rgb_to_ycbcr(green))[0, 1] < 50


def test_color_roundtrip(rng):
    rgb = rng.uniform(0, 255, size=(64, 3)).astype(np.float32)
    rt = np.asarray(color.ycbcr_to_rgb(color.rgb_to_ycbcr(rgb)))
    np.testing.assert_allclose(rt, rgb, atol=0.01)


# ---------------------------------------------------------------------------
# Tiling / padding
# ---------------------------------------------------------------------------


def test_pad_rounds_up():
    """Pad must round UP to the next multiple (the reference adds the remainder
    instead — preprocess.c:82-98, SURVEY.md component 4)."""
    img = np.zeros((13, 17, 3), dtype=np.uint8)
    out = np.asarray(tile.pad_to_multiple(img, 16, 16))
    assert out.shape == (16, 32, 3)
    aligned = np.zeros((16, 32), dtype=np.uint8)
    assert np.asarray(tile.pad_to_multiple(aligned, 16, 16)).shape == (16, 32)


def test_pad_edge_replicates():
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = np.asarray(tile.pad_to_multiple(img, 8, 8))
    assert out.shape == (8, 8)
    np.testing.assert_array_equal(out[2:, 3], np.full(6, img[2, 3]))
    np.testing.assert_array_equal(out[0, 4:], np.full(4, img[0, 3]))


def test_blockify_roundtrip(rng):
    plane = rng.standard_normal((24, 32)).astype(np.float32)
    blocks = np.asarray(tile.blockify(plane))
    assert blocks.shape == (3, 4, 8, 8)
    np.testing.assert_array_equal(blocks[1, 2], plane[8:16, 16:24])
    np.testing.assert_array_equal(np.asarray(tile.unblockify(blocks)), plane)


# ---------------------------------------------------------------------------
# Zig-zag
# ---------------------------------------------------------------------------


def test_zigzag_order_spec_prefix():
    # First entries of the T.81 Figure-5 scan (also zig_zag.c:6-15).
    np.testing.assert_array_equal(
        tables.ZIGZAG_ORDER[:10], [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    )
    assert tables.ZIGZAG_ORDER[-1] == 63
    assert sorted(tables.ZIGZAG_ORDER.tolist()) == list(range(64))


def test_zigzag_roundtrip(rng):
    blocks = rng.integers(-100, 100, size=(5, 8, 8)).astype(np.int32)
    zz = zigzag.to_zigzag(blocks)
    rt = np.asarray(zigzag.from_zigzag(zz))
    np.testing.assert_array_equal(rt, blocks)


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------


def test_quality_50_is_identity():
    np.testing.assert_array_equal(quant.luma_table(50), tables.QUANT_LUMA)
    np.testing.assert_array_equal(quant.chroma_table(50), tables.QUANT_CHROMA)


def test_quality_100_all_ones():
    assert quant.luma_table(100).max() == 1
    assert quant.chroma_table(100).max() == 1


def test_quality_clamps():
    assert quant.luma_table(1).max() <= 255  # baseline 8-bit DQT bound
    assert quant.luma_table(99).min() >= 1


def test_quality_monotone():
    prev = None
    for q in (10, 30, 50, 70, 90):
        t = quant.luma_table(q).astype(int).sum()
        if prev is not None:
            assert t <= prev
        prev = t


def test_round_half_away():
    x = np.array([0.5, -0.5, 1.5, -1.5, 2.4, -2.4], dtype=np.float32)
    out = np.asarray(quant.round_half_away(x))
    np.testing.assert_array_equal(out, [1, -1, 2, -2, 2, -2])


def test_quantize_dequantize(rng):
    coeffs = rng.uniform(-500, 500, size=(4, 8, 8)).astype(np.float32)
    q = np.asarray(quant.quantize(coeffs, tables.QUANT_LUMA))
    expect = np.sign(coeffs) * np.floor(
        np.abs(coeffs) / tables.QUANT_LUMA + 0.5
    )
    np.testing.assert_array_equal(q, expect.astype(np.int32))
    deq = np.asarray(quant.dequantize(q, tables.QUANT_LUMA))
    assert np.abs(deq - coeffs).max() <= tables.QUANT_LUMA.max() / 2 + 1e-3


# ---------------------------------------------------------------------------
# DPCM
# ---------------------------------------------------------------------------


def test_dpcm_roundtrip(rng):
    dc = rng.integers(-1000, 1000, size=37).astype(np.int32)
    for r in (0, 1, 5, 16, 100):
        d = np.asarray(dpcm.dpcm(dc, r))
        rt = np.asarray(dpcm.undpcm(d, r))
        np.testing.assert_array_equal(rt, dc)


def test_dpcm_restart_resets():
    dc = np.array([10, 20, 30, 40, 50, 60], dtype=np.int32)
    d = np.asarray(dpcm.dpcm(dc, 2))
    np.testing.assert_array_equal(d, [10, 10, 30, 10, 50, 10])


# ---------------------------------------------------------------------------
# Subsampling
# ---------------------------------------------------------------------------


def test_downsample_averages():
    p = np.array([[0.0, 2.0], [4.0, 6.0]], dtype=np.float32)
    out420 = np.asarray(subsample.downsample_plane(p, Subsampling.YUV420))
    np.testing.assert_allclose(out420, [[3.0]])
    out422 = np.asarray(subsample.downsample_plane(p, Subsampling.YUV422))
    np.testing.assert_allclose(out422, [[1.0], [5.0]])
    out444 = np.asarray(subsample.downsample_plane(p, Subsampling.YUV444))
    np.testing.assert_allclose(out444, p)


def test_upsample_shapes(rng):
    p = rng.standard_normal((8, 8)).astype(np.float32)
    assert subsample.upsample_plane(p, Subsampling.YUV420).shape == (16, 16)
    assert subsample.upsample_plane(p, Subsampling.YUV422).shape == (8, 16)
    up = np.asarray(subsample.upsample_plane(p, Subsampling.YUV420))
    np.testing.assert_array_equal(up[0:2, 0:2], np.full((2, 2), p[0, 0]))


def test_stage_timer():
    import time as _time
    from jpeg_tpu.utils.metrics import StageTimer

    t = StageTimer()
    with t.stage("a"):
        _time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.totals["a"] >= 0.01
    assert "a:" in t.report()
