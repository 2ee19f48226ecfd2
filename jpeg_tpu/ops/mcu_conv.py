"""The whole encoder transform as ONE stride-MCU convolution.

Color conversion, the -128 level shift, chroma box subsampling, the 2-D DCT
and the zig-zag permutation are all linear (or affine) maps from the MCU's
RGB pixels to its (hv + 2) x 64 zig-zag coefficients — so they compose into a
single (mcu_h, mcu_w, 3, (hv+2)*64) convolution kernel applied with stride
(mcu_h, mcu_w). XLA lowers this to one implicit-GEMM on the MXU; the output
arrives already MCU-interleaved AND in scan order, so the transform needs no
transposes, no gathers, and no intermediate planes.

Measured on the v5e (tools/tpu_probe7e.py): 14.25 ms for a 4K 4:2:0 image vs
~31 ms for the staged elementwise-color + downsample + per-plane matmul
pipeline (whose strided uint8 channel slicing and (2,2) mean reductions never
lowered well — tools/tpu_probe7d.py).

Only quantization stays outside the kernel (tables are runtime arguments, so
one compiled program serves every quality). Replaces the reference's five
separate passes (`preprocess.c` color/shift, `downsample.c` stubs, `dct.c`
per-block loops, `zig_zag.c`) with one MXU contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jpeg_tpu.config import Subsampling

_PRECISION = jax.lax.Precision.HIGHEST


@functools.cache
def mcu_kernel(mode: Subsampling) -> tuple[np.ndarray, np.ndarray]:
    """(kernel (mcu_h, mcu_w, 3, (hv+2)*64) f32, bias ((hv+2)*64,) f32).

    Output channel blk*64 + k is zig-zag DCT coefficient k of MCU block blk:
    blocks 0..hv-1 are luma in v-by-h raster order (spec A.2.3), then Cb, Cr.
    Weights are composed in float64 and rounded to f32 once. The bias folds
    the -128 level shift: it only touches DC rows (the other DCT rows sum to
    zero), and the chroma matrix rows' +128 storage offset cancels the shift
    exactly, leaving luma DC at -1024 and chroma DC at 0.
    """
    from jpeg_tpu import tables
    from jpeg_tpu.ops import color, dct

    hf, vf = mode.h_factor, mode.v_factor
    hv = hf * vf
    mh, mw = mode.mcu_height, mode.mcu_width
    d8 = dct.dct_basis().astype(np.float64)
    zz = np.kron(d8, d8)[np.asarray(tables.ZIGZAG_ORDER)]  # (64, 64)
    w = zz.reshape(64, 8, 8)  # (k, u, v)
    cw = color.RGB_TO_YCBCR.astype(np.float64)

    kern = np.zeros((mh, mw, 3, (hv + 2) * 64), dtype=np.float64)
    for a in range(vf):
        for b in range(hf):
            blk = a * hf + b
            kern[8 * a:8 * a + 8, 8 * b:8 * b + 8, :, 64 * blk:64 * blk + 64] = (
                np.einsum("kuv,c->uvck", w, cw[0])
            )
    # Chroma: the box mean spreads each subsampled tap over its vf x hf
    # source pixels with weight 1/(vf*hf).
    inv = 1.0 / (vf * hf)
    for ci, row in ((hv, cw[1]), (hv + 1, cw[2])):
        full = np.einsum("kuv,c->uvck", w, row)  # on the subsampled grid
        up = np.repeat(np.repeat(full, vf, axis=0), hf, axis=1) * inv
        kern[:, :, :, 64 * ci:64 * ci + 64] = up

    bias = np.zeros((hv + 2) * 64, dtype=np.float32)
    for blk in range(hv):
        bias[64 * blk] = -1024.0  # luma DC level shift: -(128 * 64) / 8
    return kern.astype(np.float32), bias


def zigzag_qdiv(qy, qc, hv: int):
    """((hv+2)*64,) f32 per-channel quantization divisors from the runtime
    (8, 8) tables (zig-zag order, luma channels first)."""
    from jpeg_tpu import tables

    order = jnp.asarray(tables.ZIGZAG_ORDER)
    qzy = qy.reshape(64)[order].astype(jnp.float32)
    qzc = qc.reshape(64)[order].astype(jnp.float32)
    return jnp.concatenate([jnp.tile(qzy, hv), qzc, qzc])


def _mcu_transform_staged(rgb, qy, qc, mode: Subsampling):
    """CPU form of mcu_transform: elementwise color + box downsample +
    per-plane (64, 64) zig-zag-DCT matmuls. Same output contract; ~10x fewer
    FLOPs than the fused conv, which only pays off on the MXU's idle FLOPs
    (conv: 14 ms TPU / 429 ms CPU; staged: ~31 ms TPU / ~110 ms CPU).
    Platform-local byte stability: every encode path on a given backend
    routes through the same branch."""
    from jpeg_tpu import tables
    from jpeg_tpu.ops import color, dct, quant, subsample, tile

    hf, vf = mode.h_factor, mode.v_factor
    hv = hf * vf
    n_mcu = (rgb.shape[0] // mode.mcu_height) * (rgb.shape[1] // mode.mcu_width)
    y, cb, cr = color.rgb_to_ycbcr_planes(rgb)
    y = y - 128.0
    cb = subsample.downsample_plane(cb - 128.0, mode)
    cr = subsample.downsample_plane(cr - 128.0, mode)
    order = jnp.asarray(tables.ZIGZAG_ORDER)

    def pz(p, qtab, v=1, hh=1):
        qz = qtab.reshape(64)[order].astype(jnp.float32)
        flat = tile.blocks_scan_order(p, v, hh)
        zzc = dct.fdct_zigzag_blocks(flat)
        return quant.round_half_away(zzc / qz).astype(jnp.int32)

    y_scan = pz(y, qy, vf, hf).reshape(n_mcu, hv, 64)
    cb_zz = pz(cb, qc)
    cr_zz = pz(cr, qc)
    return jnp.concatenate([y_scan, cb_zz[:, None], cr_zz[:, None]], axis=1)


def mcu_transform(rgb, qy, qc, mode: Subsampling):
    """uint8 (H, W, 3), MCU-aligned -> (n_mcu, hv+2, 64) int32 quantized
    zig-zag blocks, MCU-interleaved in scan order (DC not yet DPCM'd)."""
    from jpeg_tpu.ops import quant

    if jax.default_backend() == "cpu":
        return _mcu_transform_staged(rgb, qy, qc, mode)

    kern_np, bias_np = mcu_kernel(mode)
    kern = jnp.asarray(kern_np)
    bias = jnp.asarray(bias_np)
    hv = mode.h_factor * mode.v_factor
    out = jax.lax.conv_general_dilated(
        rgb.astype(jnp.float32)[None], kern,
        window_strides=(mode.mcu_height, mode.mcu_width), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_PRECISION,
    )[0]
    coeff = out.reshape(-1, (hv + 2) * 64) + bias
    q = quant.round_half_away(coeff / zigzag_qdiv(qy, qc, hv))
    return q.astype(jnp.int32).reshape(-1, hv + 2, 64)
