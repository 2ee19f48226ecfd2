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
