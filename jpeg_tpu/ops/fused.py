"""Pallas TPU kernel: fused level-shift + 2-D DCT + quantize for one plane.

The hot op of the whole encoder (the reference spends ~97% of its runtime in
its scalar DCT loop, src/dct.c:36-59). As plain XLA this is three dots with
HBM round-trips between them; this kernel keeps a row-band of the image in
VMEM and does shift -> row DCT -> column DCT -> quantize -> round in one pass.

Layout: image (H, W) f32/u8, grid over bands of BAND_ROWS rows; within a band
the row-index-within-block dimension (8) is contracted against the DCT basis
on the MXU with W as the wide free dimension, exactly the image-layout
separable formulation of ops/dct.py (same math, same f32 precision).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_tpu.ops.dct import dct_basis

BAND_ROWS = 64  # rows per grid step; must be a multiple of 8


def _kernel(x_ref, q_ref, d_ref, out_ref, *, band_rows: int, width: int):
    x = x_ref[:].astype(jnp.float32) - 128.0  # level shift (T.81 A.3.1)
    d = d_ref[:]

    # Vertical pass: contract the row-within-block axis against the basis.
    xb = x.reshape(band_rows // 8, 8, width)
    v = jax.lax.dot_general(
        d, xb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (8, nbands, W)
    v = v.transpose(1, 0, 2).reshape(band_rows, width)

    # Horizontal pass: contract the column-within-block axis.
    vb = v.reshape(band_rows, width // 8, 8)
    hcoef = jax.lax.dot_general(
        vb, d,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (band_rows, W/8, 8)
    coef = hcoef.reshape(band_rows, width)

    # Quantize: true division by the tiled table (bit-exact parity with the
    # XLA path — a reciprocal-multiply can differ by an ulp at .5 boundaries),
    # then round half away from zero.
    scaled = coef / q_ref[:]
    out_ref[:] = (
        jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + 0.5)
    ).astype(jnp.int32)


def _ikernel(c_ref, q_ref, d_ref, out_ref, *, band_rows: int, width: int):
    """Inverse twin of _kernel: dequantize -> column IDCT -> row IDCT ->
    level-unshift, one VMEM pass per row band."""
    c = c_ref[:].astype(jnp.float32) * q_ref[:]
    d = d_ref[:]

    # Vertical inverse: x[y] = sum_u D[u, y] c[u] — contract axis 0 of D.
    cb = c.reshape(band_rows // 8, 8, width)
    v = jax.lax.dot_general(
        d, cb,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (8, nbands, W) indexed [y, band, w]
    v = v.transpose(1, 0, 2).reshape(band_rows, width)

    # Horizontal inverse: contract the frequency axis against D's axis 0.
    vb = v.reshape(band_rows, width // 8, 8)
    hx = jax.lax.dot_general(
        vb, d,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = hx.reshape(band_rows, width) + 128.0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dequant_idct(coeffs: jnp.ndarray, qtable: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(H, W) int quantized coefficient plane (image layout) + (8, 8) table ->
    (H, W) float32 pixel plane (level-unshifted to [0, 255] range). The decode
    twin of fused_dct_quantize."""
    h, w = coeffs.shape
    band = 8
    for cand in (BAND_ROWS, 32, 16, 8):
        if h % cand == 0:
            band = cand
            break
    nbands = h // band
    q = jnp.tile(qtable.astype(jnp.float32), (band // 8, w // 8))
    return pl.pallas_call(
        functools.partial(_ikernel, band_rows=band, width=w),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec((band, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coeffs.astype(jnp.float32), q, jnp.asarray(dct_basis()))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dct_quantize(plane: jnp.ndarray, qtable: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(H, W) pixel plane + (8, 8) quant table -> (H, W) int32 quantized
    coefficients in image layout (same contract as
    quantize_plane(fdct_plane(x - 128))).

    H must be a multiple of BAND_ROWS only if it exceeds it; otherwise one band
    covers the plane. W must be a multiple of 8 (card: lane dim is W).
    """
    h, w = plane.shape
    band = 8
    for cand in (BAND_ROWS, 32, 16, 8):
        if h % cand == 0:
            band = cand
            break
    nbands = h // band

    q = jnp.tile(qtable.astype(jnp.float32), (band // 8, w // 8))

    grid = (nbands,)
    return pl.pallas_call(
        functools.partial(_kernel, band_rows=band, width=w),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((band, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(plane.astype(jnp.float32), q, jnp.asarray(dct_basis()))
