"""Probe 4: attribute the 45 ms transform (color/subsample/DCT/quant vs
blockify+zigzag) and test a one-hot-dot zigzag against the static gather.

Usage: timeout 3000 python tools/tpu_probe4.py
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

    from jpeg_tpu import tables
    from jpeg_tpu.config import Subsampling
    from jpeg_tpu.ops import color, dct, quant, subsample, tile, zigzag

    h, w = 2160, 3840
    mpix = h * w / 1e6
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    mode = Subsampling.YUV420
    qy = jnp.asarray(quant.luma_table(75))
    qc = jnp.asarray(quant.chroma_table(75))
    dev_img = jax.device_put(jnp.asarray(img))

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

    def chain(stop, zz_mode="gather"):
        def f(rgb, qy, qc):
            ycc = color.rgb_to_ycbcr(rgb) - 128.0
            y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
            cb = subsample.downsample_plane(cb, mode)
            cr = subsample.downsample_plane(cr, mode)
            if stop == "color":
                return y, cb, cr
            outs = []
            for p, qt in ((y, qy), (cb, qc), (cr, qc)):
                c = dct.fdct_plane(p)
                if stop == "dct":
                    outs.append(c)
                    continue
                qp = quant.quantize_plane(c, qt)
                if stop == "quant":
                    outs.append(qp)
                    continue
                blocks = tile.blockify(qp)
                if zz_mode == "gather":
                    outs.append(zigzag.to_zigzag(blocks).reshape(-1, 64))
                else:
                    flat = blocks.reshape(-1, 64).astype(jnp.float32)
                    perm = np.zeros((64, 64), np.float32)
                    perm[np.asarray(tables.ZIGZAG_ORDER), np.arange(64)] = 1
                    zz = jax.lax.dot_general(
                        flat, jnp.asarray(perm), (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    outs.append(zz.astype(jnp.int32))
            return tuple(outs)
        return jax.jit(f)

    # Hoist each jit: rebuilding it per call would re-trace inside the timed
    # region and swamp the device time with host work.
    f_color = chain("color")
    f_dct = chain("dct")
    f_quant = chain("quant")
    f_gather = chain("zz")
    f_onehot = chain("zz", "onehot")
    bench_step("t_color_sub", lambda: f_color(dev_img, qy, qc))
    bench_step("t_plus_dct", lambda: f_dct(dev_img, qy, qc))
    bench_step("t_plus_quant", lambda: f_quant(dev_img, qy, qc))
    bench_step("t_full_gather", lambda: f_gather(dev_img, qy, qc))
    bench_step("t_full_onehot", lambda: f_onehot(dev_img, qy, qc))


if __name__ == "__main__":
    main()
