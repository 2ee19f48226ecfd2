"""Probe 7i: three-level "tree" pack (narrow per-block level 1 + block->MCU
shift-combine + per-MCU level 2) vs the round-3 "mcu" grouping, same session.

Hypothesis: "mcu" grouping widens level 1's masked reduce to the 25-lane MCU
budget over every field (~2.8G VPU ops on 4K); the tree keeps level 1 at 10
lanes (~1.1G) and pays ~2% extra in the combine, with identical level-2
scatter counts. Full packed program A/B, outputs asserted identical.

Usage: timeout 2400 python tools/tpu_probe7i.py
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
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(
        np.stack([xx * 255 / w, yy * 255 / h, (xx + yy) * 128 / (h + w)], -1)
        + rng.integers(-10, 11, (h, w, 3)), 0, 255).astype(np.uint8)
    mode = Subsampling.YUV420
    qy = jnp.asarray(quant.luma_table(75))
    qc = jnp.asarray(quant.chroma_table(75))
    htables = huffman.standard_tables()
    luts = tuple(jnp.asarray(a) for a in bitpack.luts_from_tables(htables))
    dev_img = jax.device_put(jnp.asarray(img))

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    def bench(name, fn, n=4):
        t0 = time.time()
        sync(fn())
        print(f"[{name}] compile+warm {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = None
            for _ in range(n):
                out = fn()
            sync(out)
            best = min(best, (time.time() - t0) / n)
        print(f"[{name}] {best*1e3:.2f} ms/call (x{n})", flush=True)
        return best

    fn_mcu = E._jit_color_packed(mode, 0, False, "mcu")
    fn_tree = E._jit_color_packed(mode, 0, False, "tree")

    bench("packed program (group=mcu)", lambda: fn_mcu(dev_img, qy, qc, *luts))
    bench("packed program (group=tree)", lambda: fn_tree(dev_img, qy, qc, *luts))

    wm, tm, okm = fn_mcu(dev_img, qy, qc, *luts)
    wt, tt, okt = fn_tree(dev_img, qy, qc, *luts)
    tmv, ttv = int(np.asarray(tm)[0]), int(np.asarray(tt)[0])
    assert bool(np.asarray(okm).all()) and bool(np.asarray(okt).all())
    assert tmv == ttv, (tmv, ttv)
    nw = (tmv + 31) // 32
    a = np.asarray(wm[0, :nw])
    b = np.asarray(wt[0, :nw])
    assert np.array_equal(a, b), "word streams differ"
    print(f"outputs identical ({tmv} bits)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
