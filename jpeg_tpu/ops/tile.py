"""Padding and 8x8 block tiling as reshapes/transposes over dense arrays.

Replaces the reference's heap-allocated per-block ADT (`src/block.c`, SURVEY.md
component 2) and its pad logic (`determine_resolutions`, src/preprocess.c:72-99).
Fixes the reference's pad bug (it *adds the remainder* instead of rounding up to
the next multiple) and uses edge replication like `preprocess.c:131-152`, which
minimizes ringing at the right/bottom borders.

All shapes are static under jit: padding amounts are Python ints derived from the
input shape, so XLA sees fixed shapes (one compilation per distinct image size).
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_to_multiple(img: jnp.ndarray, mult_h: int, mult_w: int) -> jnp.ndarray:
    """Edge-replicate pad (..., H, W) or (H, W, C) spatial dims up to multiples.

    Spatial dims are assumed to be the first two of the trailing (H, W[, C])
    layout: i.e. axis -3/-2 when the array has a channel axis of size<=4, else
    the last two. To stay unambiguous, this function requires explicit (H, W)
    leading layout: img is (H, W) or (H, W, C).
    """
    h, w = img.shape[0], img.shape[1]
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph == 0 and pw == 0:
        return img
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
    return jnp.pad(img, pad, mode="edge")


def blockify(plane: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H//8, W//8, 8, 8) grid of blocks. H, W must be multiples of 8."""
    h, w = plane.shape
    assert h % 8 == 0 and w % 8 == 0, (h, w)
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def blocks_scan_order(plane: jnp.ndarray, v: int = 1, h: int = 1) -> jnp.ndarray:
    """(H, W) plane -> (H*W/64, 64) row-major flattened 8x8 blocks in MCU scan
    order, as ONE transpose (no gather): blocks are grouped v x h per MCU and
    emitted MCU-raster-major, v-by-h raster within each MCU (spec A.2.3).
    v = h = 1 gives plain raster block order. Folds blockify + the encoder's
    raster->scan permutation into a single layout change."""
    hh, ww = plane.shape
    hb, wb = hh // 8, ww // 8
    assert hb % v == 0 and wb % h == 0, (plane.shape, v, h)
    x = plane.reshape(hb // v, v, 8, wb // h, h, 8)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(hb * wb, 64)


def plane_from_scan_blocks(flat: jnp.ndarray, hb: int, wb: int,
                           v: int = 1, h: int = 1) -> jnp.ndarray:
    """Inverse of blocks_scan_order: (hb*wb, 64) scan-order flattened blocks
    -> (hb*8, wb*8) plane."""
    x = flat.reshape(hb // v, wb // h, v, h, 8, 8)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(hb * 8, wb * 8)


def unblockify(blocks: jnp.ndarray) -> jnp.ndarray:
    """(Hb, Wb, 8, 8) -> (Hb*8, Wb*8)."""
    hb, wb = blocks.shape[0], blocks.shape[1]
    return blocks.transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)
