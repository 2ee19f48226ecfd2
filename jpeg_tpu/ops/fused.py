"""Pallas TPU kernels: fused level-shift + 2-D DCT + quantize for one plane.

The hot op of the whole encoder (the reference spends ~97% of its runtime in
its scalar DCT loop, src/dct.c:36-59). As plain XLA this is three dots with
HBM round-trips between them; these kernels keep an 8-row band in VMEM and do
the contraction + elementwise work in one pass.

Mosaic layout constraints shape the design (verified on a real v5e: reshapes
that merge or split the sublane dimension of a loaded vector are rejected with
"unsupported shape cast"). So the separable DCT runs as TWO pallas_call
passes of the same kernel — `out_band = D @ x_band` over 8-row bands — with
an XLA transpose between and after them:

  pass V:  Y1[8m+u, w]       = sum_y D[u, y] (X[8m+y, w] - 128)
  (W, H) transpose
  pass H:  OUT_T[8c+j, 8m+u] = sum_x D[j, x] Y1_T[8c+x, 8m+u], then /q^T, round
  (H, W) transpose back

Each kernel is a single (8,8)x(8,W) MXU dot plus VPU elementwise — no
in-kernel reshape or transpose at all. The two XLA transposes add ~4 plane
passes of HBM traffic, noise next to the dots. Math and f32 precision are
identical to ops/dct.py (Precision.HIGHEST), so outputs match the XLA path
except for ±1 ULP rounding-boundary cases (documented in models/encoder.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_tpu.ops.dct import dct_basis

# Rows of 8-row bands processed per grid step (VMEM block = (8*BANDS_PER_STEP,
# W) f32; 3840 lanes * 64 rows = ~1 MB, comfortably inside VMEM with double
# buffering). The kernel loops over the bands with static slices — Mosaic
# accepts static 8-row slicing where it rejects sublane reshapes.
BANDS_PER_STEP = 8


def _dct8_kernel(x_ref, d_ref, q_ref, out_ref, *, shift: bool, quantize: bool,
                 nbands: int, width: int):
    """out[8b+u, :] = sum_y D[u, y] x[8b+y, :] for each 8-row band b, then
    optional quantize (divide by the (8, W)-tiled table, round half away from
    zero). All slices are static; no reshapes."""
    d = d_ref[:]
    for b in range(nbands):
        x = x_ref[8 * b : 8 * b + 8, :]
        if shift:
            x = x - 128.0  # level shift (T.81 A.3.1)
        v = jax.lax.dot_general(
            d, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, W)
        if quantize:
            # True division (a reciprocal-multiply can differ by an ulp at
            # .5 boundaries), round half away from zero.
            scaled = v / q_ref[:]
            v = jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + 0.5)
        out_ref[8 * b : 8 * b + 8, :] = v


def _idct8_kernel(c_ref, d_ref, q_ref, out_ref, *, dequantize: bool,
                  unshift: bool, nbands: int, width: int):
    """Inverse twin: out[8b+y, :] = sum_u D[u, y] c[8b+u, :] (contract axis 0
    of D), with optional dequantize before and +128 unshift after."""
    d = d_ref[:]
    for b in range(nbands):
        c = c_ref[8 * b : 8 * b + 8, :]
        if dequantize:
            c = c * q_ref[:]
        v = jax.lax.dot_general(
            d, c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if unshift:
            v = v + 128.0
        out_ref[8 * b : 8 * b + 8, :] = v


def _band_geometry(h: int):
    per_step = BANDS_PER_STEP
    while h % (8 * per_step) and per_step > 1:
        per_step //= 2
    return per_step, h // (8 * per_step)


def _dct_pass(x, qtile, *, shift: bool, quantize: bool, interpret: bool):
    """One vertical-DCT pass over (H, W) in image layout."""
    h, w = x.shape
    per_step, steps = _band_geometry(h)
    block = 8 * per_step
    return pl.pallas_call(
        functools.partial(_dct8_kernel, shift=shift, quantize=quantize,
                          nbands=per_step, width=w),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((block, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(dct_basis()), qtile)


def _idct_pass(c, qtile, *, dequantize: bool, unshift: bool, interpret: bool):
    h, w = c.shape
    per_step, steps = _band_geometry(h)
    block = 8 * per_step
    return pl.pallas_call(
        functools.partial(_idct8_kernel, dequantize=dequantize,
                          unshift=unshift, nbands=per_step, width=w),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((block, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c, jnp.asarray(dct_basis()), qtile)


def _tile_row(qcol: jnp.ndarray, w: int) -> jnp.ndarray:
    """(8, 8) -> (8, w) tile along lanes."""
    return jnp.tile(qcol.astype(jnp.float32), (1, w // 8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dct_quantize(plane: jnp.ndarray, qtable: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(H, W) pixel plane + (8, 8) quant table -> (H, W) int32 quantized
    coefficients in image layout (same contract as
    quantize_plane(fdct_plane(x - 128))). H and W must be multiples of 8."""
    h, w = plane.shape
    x = plane.astype(jnp.float32)
    dummy = jnp.ones((8, w), jnp.float32)
    y1 = _dct_pass(x, dummy, shift=True, quantize=False, interpret=interpret)
    # Horizontal pass on the transpose: OUT_T[8c+j, 8m+u] needs q[u, j] ->
    # table transposed, tiled along the (now H-wide) lane dimension.
    y1t = y1.T
    qt = _tile_row(qtable.astype(jnp.float32).T, h)
    out_t = _dct_pass(y1t, qt, shift=False, quantize=True, interpret=interpret)
    return out_t.T.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dequant_idct(coeffs: jnp.ndarray, qtable: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(H, W) int quantized coefficient plane (image layout) + (8, 8) table ->
    (H, W) float32 pixel plane (level-unshifted to [0, 255] range). The decode
    twin of fused_dct_quantize."""
    h, w = coeffs.shape
    c = coeffs.astype(jnp.float32)
    q = _tile_row(qtable, w)
    z1 = _idct_pass(c, q, dequantize=True, unshift=False, interpret=interpret)
    z1t = z1.T
    dummy = jnp.ones((8, h), jnp.float32)
    out_t = _idct_pass(z1t, dummy, dequantize=False, unshift=True,
                       interpret=interpret)
    return out_t.T
