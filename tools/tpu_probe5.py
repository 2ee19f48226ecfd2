"""Probe 5: the color+subsample stage is the whole transform cost (44 of
45 ms, tools/tpu_probe4.py). Compare layout strategies on the chip:

  a. matmul      — (H, W, 3) @ (3, 3) HIGHEST (current production)
  b. slices      — per-channel minor-dim slices + FMA chains
  c. transpose   — (3, H, W) f32 transpose first, then FMA chains
  d. planar      — input already (3, H, W) uint8 (the serving floor)

Usage: timeout 2400 python tools/tpu_probe5.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    from jpeg_tpu.config import Subsampling
    from jpeg_tpu.ops import color, subsample

    h, w = 2160, 3840
    mpix = h * w / 1e6
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    mode = Subsampling.YUV420
    dev_img = jax.device_put(jnp.asarray(img))
    dev_planar = jax.device_put(jnp.asarray(img.transpose(2, 0, 1).copy()))

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    def bench_step(name, fn, n=3):
        try:
            t0 = time.time()
            sync(fn())
            print(f"[{name}] warm/compile {time.time()-t0:.1f}s", flush=True)
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                sync(fn())
                best = min(best, time.time() - t0)
            print(f"[{name}] best {best*1e3:.1f} ms = {mpix/best:.1f} MPix/s",
                  flush=True)
            return best
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: "
                  + " | ".join(str(e).splitlines()[:4]), flush=True)
            return None

    M = color.RGB_TO_YCBCR

    def finish(y, cb, cr):
        y = y - 128.0
        cb = subsample.downsample_plane(cb - 128.0, mode)
        cr = subsample.downsample_plane(cr - 128.0, mode)
        return y, cb, cr

    def fma(r, g, b):
        y = M[0, 0] * r + M[0, 1] * g + M[0, 2] * b
        cb = M[1, 0] * r + M[1, 1] * g + M[1, 2] * b + 128.0
        cr = M[2, 0] * r + M[2, 1] * g + M[2, 2] * b + 128.0
        return y, cb, cr

    @jax.jit
    def v_matmul(x):
        ycc = color.rgb_to_ycbcr(x) - 128.0
        return (ycc[..., 0],
                subsample.downsample_plane(ycc[..., 1], mode),
                subsample.downsample_plane(ycc[..., 2], mode))

    @jax.jit
    def v_slices(x):
        xf = x.astype(jnp.float32)
        return finish(*fma(xf[..., 0], xf[..., 1], xf[..., 2]))

    @jax.jit
    def v_transpose(x):
        xt = x.transpose(2, 0, 1).astype(jnp.float32)
        return finish(*fma(xt[0], xt[1], xt[2]))

    @jax.jit
    def v_planar(xp):
        xf = xp.astype(jnp.float32)
        return finish(*fma(xf[0], xf[1], xf[2]))

    bench_step("color_matmul", lambda: v_matmul(dev_img))
    bench_step("color_slices", lambda: v_slices(dev_img))
    bench_step("color_transpose", lambda: v_transpose(dev_img))
    bench_step("color_planar_floor", lambda: v_planar(dev_planar))


if __name__ == "__main__":
    main()
