"""Probe 2: validate the reworked fused Pallas DCT on the chip and attribute
the XLA device-pack cost stage by stage (bitfields vs level-1 vs level-2).

Usage: timeout 3000 python tools/tpu_probe2.py
"""

from __future__ import annotations

import functools
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
    from jpeg_tpu.ops import dpcm as dpcm_ops

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
        # Pull ONE element (ravel on device): np.asarray(full) would drag the
        # whole output through the ~30 MB/s tunnel and dominate every timing.
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
            msg = str(e).splitlines()[:6]
            print(f"[{name}] FAILED: {type(e).__name__}: " + " | ".join(msg),
                  flush=True)
            return None

    # 1. Reworked fused Pallas transform (two band passes + XLA transposes).
    tf_p = E._jit_color(mode, True)
    bench_step("transform_pallas_v2", lambda: tf_p(dev_img, qy, qc))

    # 2. XLA transform baseline (cached).
    tf_x = E._jit_color(mode)
    bench_step("transform_xla", lambda: tf_x(dev_img, qy, qc))

    # --- pack attribution: chain prefixes of _transform_color_packed ---------
    def chain(stop):
        def f(rgb, qy, qc, dc_code, dc_len, ac_code, ac_len, perm_y, gather, tbl):
            y_zz, cb_zz, cr_zz = E._transform_color(rgb, qy, qc, mode=mode)
            hv = 4
            y_scan = y_zz[perm_y]
            y_scan = y_scan.at[:, 0].set(dpcm_ops.dpcm(y_scan[:, 0], 0))
            cb_zz = cb_zz.at[:, 0].set(dpcm_ops.dpcm(cb_zz[:, 0], 0))
            cr_zz = cr_zz.at[:, 0].set(dpcm_ops.dpcm(cr_zz[:, 0], 0))
            blocks = jnp.concatenate([y_scan, cb_zz, cr_zz], axis=0)[gather]
            if stop == "gather":
                return blocks
            bits, nbits = bitpack.build_bitfields(
                blocks, tbl, dc_code, dc_len, ac_code, ac_len
            )
            if stop == "bitfields":
                return bits, nbits
            # level 1 only (replicate pack_bits' first half)
            nbits = nbits.astype(jnp.int32)
            starts = jnp.cumsum(nbits, axis=1) - nbits
            t_b = starts[:, -1] + nbits[:, -1]
            hi, lo = bitpack._field_split(bits, nbits, starts)
            w_r = jnp.clip(starts >> 5, 0, bitpack.BLOCK_WORDS - 1)
            wg = jnp.arange(bitpack.BLOCK_WORDS + 1, dtype=jnp.int32)[None, None, :]
            buf = jnp.sum(
                jnp.where(w_r[:, :, None] == wg, hi[:, :, None], jnp.uint32(0))
                + jnp.where((w_r + 1)[:, :, None] == wg, lo[:, :, None],
                            jnp.uint32(0)),
                axis=1, dtype=jnp.uint32,
            )
            return buf, t_b
        return jax.jit(f)

    f_gather = chain("gather")
    bench_step("pack_upto_gather",
               lambda: f_gather(dev_img, qy, qc, *luts, *geom))
    f_bits = chain("bitfields")
    bench_step("pack_upto_bitfields",
               lambda: f_bits(dev_img, qy, qc, *luts, *geom))
    f_l1 = chain("level1")
    bench_step("pack_upto_level1",
               lambda: f_l1(dev_img, qy, qc, *luts, *geom))

    fn_x = E._jit_color_packed(mode, 0)
    bench_step("packed_xla_full", lambda: fn_x(dev_img, qy, qc, *luts, *geom))


if __name__ == "__main__":
    main()
