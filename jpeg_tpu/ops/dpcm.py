"""DC DPCM as a vectorized shifted subtract with restart-interval resets.

The reference makes this a serial cross-block chain (`src/dpcm.c:10-20`). Here
it is a pure data-parallel op: prev-DC is a roll, and restart intervals (the
spec's own parallel seam — DRI/RSTn reset the predictor) become a mask instead
of control flow, so the op stays jit/shard-friendly. Under shard_map, the
boundary predictor between shards is exchanged with ppermute (see
jpeg_tpu.parallel.shard).
"""

from __future__ import annotations

import jax.numpy as jnp


def dpcm(dc: jnp.ndarray, restart_interval: int = 0) -> jnp.ndarray:
    """(N,) DC values in MCU scan order -> (N,) DPCM differences.

    Position k encodes dc[k] - pred, where pred is dc[k-1], or 0 at k=0 and at
    every restart-segment start (k % restart_interval == 0).
    """
    prev = jnp.concatenate([jnp.zeros((1,), dc.dtype), dc[:-1]])
    if restart_interval:
        idx = jnp.arange(dc.shape[0])
        prev = jnp.where(idx % restart_interval == 0, 0, prev)
    return dc - prev


def undpcm(diffs: jnp.ndarray, restart_interval: int = 0) -> jnp.ndarray:
    """Inverse of dpcm: per-segment cumulative sum (decoder side)."""
    if not restart_interval:
        return jnp.cumsum(diffs)
    n = diffs.shape[0]
    r = int(restart_interval)
    pad = (-n) % r
    seg = jnp.pad(diffs, (0, pad)).reshape(-1, r)
    return jnp.cumsum(seg, axis=1).reshape(-1)[:n]
