"""Real-TPU probe: compile + time every hot-path candidate on the chip.

Times (device-resident, tunnel excluded) for 4K q75 4:2:0:
  - XLA transform (_jit_color) vs fused Pallas transform (use_pallas=True)
  - XLA device pack (_jit_color_packed) vs Pallas level-1 pack variant
  - hybrid indexed decode (scan upload + parallel device block decode)

Each step is independently guarded so one Mosaic failure doesn't kill the
probe. Run under `timeout` (the tunnel can wedge); every compile lands in
.jax_cache so later bench runs are warm. Usage:

  timeout 3000 python tools/tpu_probe.py [--skip transform_pallas,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    skip = set()
    for a in sys.argv[1:]:
        if a.startswith("--skip"):
            skip |= set(a.split("=", 1)[1].split(","))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    from jpeg_tpu import decode
    from jpeg_tpu.config import Subsampling
    from jpeg_tpu.entropy import huffman
    from jpeg_tpu.models import encoder as E
    from jpeg_tpu.ops import bitpack, quant

    h, w = 2160, 3840
    mpix = h * w / 1e6
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(
        np.stack([xx * 255 / w, yy * 255 / h, (xx + yy) * 128 / (h + w)], -1)
        + rng.integers(-10, 11, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)
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

    results = {}

    def bench_step(name, fn, n=3):
        if name in skip:
            print(f"[{name}] skipped", flush=True)
            return
        try:
            t0 = time.time()
            sync(fn())
            print(f"[{name}] warm/compile {time.time()-t0:.1f}s", flush=True)
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                sync(fn())
                best = min(best, time.time() - t0)
            results[name] = best
            print(f"[{name}] best {best*1e3:.1f} ms = {mpix/best:.1f} MPix/s",
                  flush=True)
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)

    tf_x = E._jit_color(mode)
    bench_step("transform_xla", lambda: tf_x(dev_img, qy, qc))

    tf_p = E._jit_color(mode, True)
    bench_step("transform_pallas", lambda: tf_p(dev_img, qy, qc))

    fn_x = E._jit_color_packed(mode, 0)
    bench_step("packed_xla", lambda: fn_x(dev_img, qy, qc, *luts, *geom))

    fn_p = E._jit_color_packed(mode, 0, True)
    bench_step("packed_pallas", lambda: fn_p(dev_img, qy, qc, *luts, *geom))

    # Decode: build a stream once (host), then the device-resident decode.
    try:
        from jpeg_tpu import encode

        jpg = encode(np.asarray(img), quality=75, subsampling="420",
                     device_pack=False)
        bench_step("decode_indexed",
                   lambda: decode(jpg, entropy="indexed", device_output=True))
        bench_step("decode_auto",
                   lambda: decode(jpg, device_output=True))
    except Exception as e:
        print(f"[decode] setup FAILED: {e}", flush=True)

    print("RESULTS " + " ".join(
        f"{k}={v*1e3:.1f}ms" for k, v in sorted(results.items())), flush=True)


if __name__ == "__main__":
    main()
