"""Quantization / dequantization.

Replaces `src/quantise.c:30-72`. The canonical integer contract (SURVEY.md §7
hard part (c)): quantized = round_half_away_from_zero(coef / Q), computed in
float32 and emitted as int32. This matches the reference's luma/chroma rounding
(`quantise.c:58` style round-to-nearest) and — unlike the reference's zig-zag
stage, which *truncates* double->int at `zig_zag.c:56` — the rounding happens
exactly once, here. Tables are pure functions of quality (no global mutation;
fixes the double-scale latent bug at `quantise.c:34-35`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from jpeg_tpu import tables


def luma_table(quality: int) -> np.ndarray:
    return tables.quality_scaled_table(tables.QUANT_LUMA, quality)


def chroma_table(quality: int) -> np.ndarray:
    return tables.quality_scaled_table(tables.QUANT_CHROMA, quality)


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """Round to nearest, ties away from zero (the canonical pipeline rounding)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def quantize(coeffs: jnp.ndarray, qtable: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) float coeffs / broadcastable (8, 8) table -> int32."""
    q = jnp.asarray(qtable, dtype=jnp.float32)
    return round_half_away(coeffs / q).astype(jnp.int32)


def dequantize(qcoeffs: jnp.ndarray, qtable: jnp.ndarray) -> jnp.ndarray:
    q = jnp.asarray(qtable, dtype=jnp.float32)
    return qcoeffs.astype(jnp.float32) * q


def quantize_plane(coeffs: jnp.ndarray, qtable: jnp.ndarray) -> jnp.ndarray:
    """Image-layout (H, W) coefficient plane / (8, 8) table tiled over blocks."""
    h, w = coeffs.shape
    q = jnp.tile(jnp.asarray(qtable, dtype=jnp.float32), (h // 8, w // 8))
    return round_half_away(coeffs / q).astype(jnp.int32)


def dequantize_plane(qcoeffs: jnp.ndarray, qtable: jnp.ndarray) -> jnp.ndarray:
    h, w = qcoeffs.shape
    q = jnp.tile(jnp.asarray(qtable, dtype=jnp.float32), (h // 8, w // 8))
    return qcoeffs.astype(jnp.float32) * q
