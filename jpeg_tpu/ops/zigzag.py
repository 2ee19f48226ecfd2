"""Zig-zag scan as a single vectorized gather (replaces src/zig_zag.c:17-59).

The reference scatters per block with a transposed accessor quirk
(`get_value_block(b, j, i)` at zig_zag.c:56); here both directions are one
gather with the spec permutation from jpeg_tpu.tables, applied to the whole
(..., 64) batch at once.
"""

from __future__ import annotations

import jax.numpy as jnp

from jpeg_tpu import tables


def to_zigzag(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) -> (..., 64) in zig-zag order."""
    flat = blocks.reshape(*blocks.shape[:-2], 64)
    return flat[..., jnp.asarray(tables.ZIGZAG_ORDER)]


def from_zigzag(zz: jnp.ndarray) -> jnp.ndarray:
    """(..., 64) zig-zag order -> (..., 8, 8) raster blocks."""
    flat = zz[..., jnp.asarray(tables.INV_ZIGZAG)]
    return flat.reshape(*zz.shape[:-1], 8, 8)
