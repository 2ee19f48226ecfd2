"""Pallas fused DCT+quantize kernel vs the XLA reference path (interpret mode
on CPU; the same code compiles to Mosaic on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jpeg_tpu import tables
from jpeg_tpu.ops import dct, fused, quant


def _reference(plane, qtable):
    coef = dct.fdct_plane(plane.astype(jnp.float32) - 128.0)
    return np.asarray(quant.quantize_plane(coef, qtable))


def _assert_coef_equal(got, expect):
    """Allow a tiny rate of +-1 differences: the kernel's dot accumulation
    order differs from the XLA einsum by an ulp, which can flip rounding at
    exact .5 boundaries. Anything larger is a real bug."""
    diff = got.astype(np.int64) - expect.astype(np.int64)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    ndiff = int((diff != 0).sum())
    assert ndiff <= max(8, 5e-4 * diff.size), ndiff


@pytest.mark.parametrize("shape", [(64, 128), (8, 64), (48, 40), (128, 384)])
def test_fused_matches_xla(rng, shape):
    plane = rng.integers(0, 256, size=shape).astype(np.uint8)
    got = np.asarray(
        fused.fused_dct_quantize(jnp.asarray(plane),
                                 jnp.asarray(tables.QUANT_LUMA), interpret=True)
    )
    expect = _reference(jnp.asarray(plane), tables.QUANT_LUMA)
    _assert_coef_equal(got, expect)


def test_fused_quality_tables(rng):
    plane = rng.integers(0, 256, size=(32, 64)).astype(np.uint8)
    for q in (10, 75, 95):
        qt = quant.luma_table(q)
        got = np.asarray(
            fused.fused_dct_quantize(jnp.asarray(plane), jnp.asarray(qt),
                                     interpret=True)
        )
        expect = _reference(jnp.asarray(plane), qt)
        _assert_coef_equal(got, expect)


def test_encode_use_pallas_end_to_end(rng):
    """encode(use_pallas=True) produces a valid stream with near-identical
    pixels to the XLA path (interpret mode on CPU)."""
    import io
    from PIL import Image
    from jpeg_tpu import encode

    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([xx * 5, yy * 7, xx + yy], -1).astype(np.uint8)
    a = encode(img, quality=85, subsampling="420", use_pallas=True)
    b = encode(img, quality=85, subsampling="420")
    pa = np.asarray(Image.open(io.BytesIO(a)).convert("RGB"))
    pb = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
    assert np.abs(pa.astype(int) - pb.astype(int)).max() <= 2


@pytest.mark.parametrize("shape", [(64, 128), (8, 64), (48, 40)])
def test_fused_idct_matches_xla(rng, shape):
    """fused_dequant_idct == dequantize_plane + idct_plane + 128."""
    coeffs = rng.integers(-100, 100, size=shape).astype(np.int32)
    got = np.asarray(
        fused.fused_dequant_idct(jnp.asarray(coeffs),
                                 jnp.asarray(tables.QUANT_LUMA), interpret=True)
    )
    deq = quant.dequantize_plane(jnp.asarray(coeffs), tables.QUANT_LUMA)
    expect = np.asarray(dct.idct_plane(deq)) + 128.0
    np.testing.assert_allclose(got, expect, atol=1e-2)


def test_fused_roundtrip(rng):
    """fused forward then fused inverse reconstructs the plane closely."""
    plane = rng.integers(0, 256, size=(32, 64)).astype(np.uint8)
    ones = np.ones((8, 8), np.int32)
    q = fused.fused_dct_quantize(jnp.asarray(plane), jnp.asarray(ones),
                                 interpret=True)
    back = np.asarray(fused.fused_dequant_idct(q, jnp.asarray(ones),
                                               interpret=True))
    assert np.abs(back - plane.astype(np.float32)).max() < 1.0


def test_decode_use_pallas(tiger):
    """decode(use_pallas=True) agrees with the XLA decode to within rounding."""
    from jpeg_tpu import decode, encode

    jpg = encode(tiger, quality=85, subsampling="420")
    a = decode(jpg, use_pallas=True)
    b = decode(jpg)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
