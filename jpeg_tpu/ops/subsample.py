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
    return fancy_upsample_factors(plane, mode.v_factor, mode.h_factor)


def upsample_factors(plane: jnp.ndarray, fv: int, fh: int) -> jnp.ndarray:
    """Nearest-neighbor upsample by integer factors (decoder general path)."""
    if fv > 1:
        plane = jnp.repeat(plane, fv, axis=0)
    if fh > 1:
        plane = jnp.repeat(plane, fh, axis=1)
    return plane


def fancy_upsample_factors(plane: jnp.ndarray, fv: int, fh: int) -> jnp.ndarray:
    """Triangular upsample generalized to power-of-two factors (a 4x factor —
    e.g. 4:1:1 luma sampling — chains two doubling passes)."""
    out = plane.astype(jnp.float32)
    f = fh
    while f > 1:
        if f % 2:
            return upsample_factors(out, fv, f)  # non-pow2: fall back
        out = _triangle_axis(out, 1)
        f //= 2
    f = fv
    while f > 1:
        if f % 2:
            return upsample_factors(out, f, 1)
        out = _triangle_axis(out, 0)
        f //= 2
    return out
