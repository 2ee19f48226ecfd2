"""Chroma subsampling / upsampling — the stages the reference stubbed out
("not ready yet", src/downsample.c:24-32; SURVEY.md component 5).

Downsampling is box averaging (2x1 for 4:2:2, 2x2 for 4:2:0), implemented as
reshape+mean so XLA fuses it. Upsampling (decoder side) is nearest-neighbor
replication, matching the baseline JFIF convention of simple pixel doubling
(fancy upsampling is a decoder quality option, kept simple and deterministic
here; shapes stay static).

Ordering note: subsample AFTER color conversion on centered/unshifted chroma —
the ordering constraint the reference's notes call out (src/Notes:44-50).
"""

from __future__ import annotations

import jax.numpy as jnp

from jpeg_tpu.config import Subsampling


def downsample_plane(plane: jnp.ndarray, mode: Subsampling) -> jnp.ndarray:
    """(H, W) chroma plane -> subsampled plane. H, W must divide the factors."""
    h, w = plane.shape
    fh, fw = mode.v_factor, mode.h_factor
    if fh == 1 and fw == 1:
        return plane
    assert h % fh == 0 and w % fw == 0, (h, w, mode)
    x = plane.reshape(h // fh, fh, w // fw, fw)
    return jnp.mean(x.astype(jnp.float32), axis=(1, 3))


def upsample_plane(plane: jnp.ndarray, mode: Subsampling) -> jnp.ndarray:
    """Nearest-neighbor chroma upsample back to luma resolution."""
    fh, fw = mode.v_factor, mode.h_factor
    if fh == 1 and fw == 1:
        return plane
    return jnp.repeat(jnp.repeat(plane, fh, axis=0), fw, axis=1)


def _triangle_axis(plane: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Double one axis with libjpeg-style triangular weights: each output
    sample is (3*near + far) / 4, edges replicated."""
    x = jnp.moveaxis(plane, axis, 0)
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
    nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
    a = (3.0 * x + prev) * 0.25
    b = (3.0 * x + nxt) * 0.25
    out = jnp.stack([a, b], axis=1).reshape(2 * x.shape[0], *x.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def fancy_upsample_plane(plane: jnp.ndarray, mode: Subsampling) -> jnp.ndarray:
    """Triangular-filter chroma upsample (libjpeg's "fancy" h2v1/h2v2),
    markedly better than pixel doubling on smooth chroma gradients."""
    out = plane.astype(jnp.float32)
    if mode.h_factor == 2:
        out = _triangle_axis(out, 1)
    if mode.v_factor == 2:
        out = _triangle_axis(out, 0)
    return out
