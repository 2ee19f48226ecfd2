"""Probe 7h: the sparse-coefficient decode backend (host sparse walk + device
densify) vs the indexed while_loop kernel (7g: 164 ms), same session.

Hypothesis: the v5e's ~164 ms AC while_loop floor disappears when the host
resolves the entropy layer sparsely (~3 B/coefficient) and the device only
densifies (sorted segment-sum over one-hot position masks — pure VPU work).

Usage: timeout 2400 python tools/tpu_probe7h.py
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

    from jpeg_tpu import decode, encode
    from jpeg_tpu.entropy import native
    from jpeg_tpu.io import jfif
    from jpeg_tpu.models import layout as L

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(
        np.stack([xx * 255 / w, yy * 255 / h, (xx + yy) * 128 / (h + w)], -1)
        + rng.integers(-10, 11, (h, w, 3)), 0, 255).astype(np.uint8)
    jpg = encode(img, quality=75, subsampling="420")
    print(f"stream: {len(jpg)} bytes", flush=True)

    info = jfif.parse_jpeg(jpg)
    cy = info.components[0]
    n_mcu = L.ceil_div(info.height, 8 * cy.v) * L.ceil_div(info.width, 8 * cy.h)
    mcu_layout = [
        (i, c.h * c.v, c.dc_id, c.ac_id) for i, c in enumerate(info.components)
    ]

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    # Host sparse walk alone.
    t0 = time.time()
    vals, ks, counts, dc = native.sparse_scan(
        info.scan_data, n_mcu, mcu_layout, info.htables, info.restart_interval)
    t1 = time.time()
    for _ in range(3):
        native.sparse_scan(info.scan_data, n_mcu, mcu_layout, info.htables,
                           info.restart_interval)
    t2 = time.time()
    print(f"[sparse_scan host] cold {1e3*(t1-t0):.1f} ms, warm "
          f"{1e3*(t2-t1)/3:.1f} ms, S={vals.shape[0]} "
          f"({vals.shape[0]*3/1e6:.2f} MB payload)", flush=True)

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

    from jpeg_tpu.models.decoder import _decode_scan

    bench("entropy sparse (walk+upload+densify)",
          lambda: _decode_scan(info, n_mcu, mcu_layout, "sparse"))
    bench("entropy indexed (walk+upload+AC kernel)",
          lambda: _decode_scan(info, n_mcu, mcu_layout, "indexed"))
    bench("decode sparse device-resident",
          lambda: decode(jpg, entropy="sparse", device_output=True))
    bench("decode indexed device-resident",
          lambda: decode(jpg, entropy="indexed", device_output=True))
    print("done", flush=True)


if __name__ == "__main__":
    main()
