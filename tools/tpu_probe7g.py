"""Probe 7g: the unrolled (x4) gather-free AC kernel vs 7f's 170 ms, same
session. Usage: timeout 2400 python tools/tpu_probe7g.py
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
    from jpeg_tpu.entropy import huffman, native, decode_device
    from jpeg_tpu.io import jfif
    from jpeg_tpu.models import encoder as E
    from jpeg_tpu.ops import bitpack, quant

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(
        np.stack([xx * 255 / w, yy * 255 / h, (xx + yy) * 128 / (h + w)], -1)
        + rng.integers(-10, 11, (h, w, 3)), 0, 255).astype(np.uint8)
    mode = Subsampling.YUV420
    qy_np, qc_np = quant.luma_table(75), quant.chroma_table(75)
    qy, qc = jnp.asarray(qy_np), jnp.asarray(qc_np)
    htables = huffman.standard_tables()
    luts = tuple(jnp.asarray(a) for a in bitpack.luts_from_tables(htables))
    dev_img = jax.device_put(jnp.asarray(img))
    n_mcu = (h // 16) * (w // 16)

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

    fnp = E._jit_color_packed(mode, 0)
    out = fnp(dev_img, qy, qc, *luts)
    t = int(np.asarray(out[1])[0])
    scan = bitpack.finalize_segment(
        np.asarray(out[0][0, : (t + 31) // 32]), t).tobytes()
    comps = [
        jfif.ComponentSpec(1, 2, 2, 0, 0, 0),
        jfif.ComponentSpec(2, 1, 1, 1, 1, 1),
        jfif.ComponentSpec(3, 1, 1, 1, 1, 1),
    ]
    jpg = jfif.write_jpeg(w, h, comps, {0: qy_np, 1: qc_np}, htables, scan)
    info = jfif.parse_jpeg(jpg)
    ml = [(i, c.h * c.v, c.dc_id, c.ac_id)
          for i, c in enumerate(info.components)]
    destuffed, ac_off, dcv = native.index_scan(
        info.scan_data, n_mcu, ml, info.htables, 0)
    ac_slots = tuple(sorted({(1, ac) for (_, _, _, ac) in ml}))
    lut_key = tuple((key, info.htables[key].size.tobytes(),
                     info.htables[key].code.tobytes()) for key in ac_slots)
    canon = decode_device._cached_canonical(lut_key, info.htables, ac_slots)
    slot_dev = decode_device._cached_slot_array(
        tuple((bpm, 0) for (_, bpm, _, _) in ml), n_mcu)
    nwords2 = 1 << max(6, (len(destuffed) // 4 + 4).bit_length())
    buf = np.zeros(nwords2 * 4, dtype=np.uint8)
    buf[: len(destuffed)] = destuffed
    words_d = jax.device_put(buf.view(">u4").astype(np.uint32))
    off_d = jax.device_put(ac_off)
    dc_d = jax.device_put(dcv)
    sync((words_d, off_d, dc_d))

    bench("ac_unroll4", lambda: decode_device._indexed_jit(
        words_d, off_d, dc_d, slot_dev, *canon))
    print("done", flush=True)


if __name__ == "__main__":
    main()
