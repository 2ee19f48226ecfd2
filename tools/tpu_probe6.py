"""Probe 6: separate per-dispatch tunnel overhead from true device compute.

Evidence so far: wildly different programs (bit_size, level-2 scatter, planar
color, full transform) all measure 26-45 ms — a fixed per-call floor. Here:
  - transform_x1 vs transform_x2: same program body run twice inside ONE jit
    (the delta is the true device cost of one transform);
  - pipelined_x8: 8 async dispatches, one sync (steady-state throughput —
    what a serving deployment sees).

Usage: timeout 2400 python tools/tpu_probe6.py
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
    from jpeg_tpu.entropy import huffman
    from jpeg_tpu.models import encoder as E
    from jpeg_tpu.ops import bitpack, quant

    h, w = 2160, 3840
    mpix = h * w / 1e6
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    mode = Subsampling.YUV420
    qy = jnp.asarray(quant.luma_table(75))
    qc = jnp.asarray(quant.chroma_table(75))
    htables = huffman.standard_tables()
    luts = tuple(jnp.asarray(a) for a in bitpack.luts_from_tables(htables))
    geom = E._packed_geometry(h // 16, w // 16, mode)
    dev_img = jax.device_put(jnp.asarray(img))

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    def bench_step(name, fn, n=3, scale=1.0):
        try:
            t0 = time.time()
            sync(fn())
            print(f"[{name}] warm/compile {time.time()-t0:.1f}s", flush=True)
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                sync(fn())
                best = min(best, time.time() - t0)
            eff = best / scale
            print(f"[{name}] best {best*1e3:.1f} ms "
                  f"({eff*1e3:.1f} ms/unit = {mpix/eff:.1f} MPix/s)",
                  flush=True)
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: "
                  + " | ".join(str(e).splitlines()[:4]), flush=True)

    def transform_body(x, q1, q2):
        return E._transform_color(x, q1, q2, mode=mode)

    f_x1 = jax.jit(transform_body)
    f_x2 = jax.jit(
        lambda x, q1, q2: (transform_body(x, q1, q2),
                           transform_body(x + 1, q1, q2))
    )
    bench_step("transform_x1", lambda: f_x1(dev_img, qy, qc))
    bench_step("transform_x2", lambda: f_x2(dev_img, qy, qc), scale=2.0)

    def pipelined(fn, args, k):
        def run():
            out = None
            for _ in range(k):
                out = fn(*args)
            return out
        return run

    bench_step("transform_pipe_x8", pipelined(f_x1, (dev_img, qy, qc), 8),
               scale=8.0)

    fn_packed = E._jit_color_packed(mode, 0)
    args_p = (dev_img, qy, qc, *luts, *geom)
    bench_step("packed_x1", lambda: fn_packed(*args_p))
    bench_step("packed_pipe_x8", pipelined(fn_packed, args_p, 8), scale=8.0)


if __name__ == "__main__":
    main()
