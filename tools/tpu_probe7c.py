"""Probe 7c: attribution of the remaining pack_ms/transform_ms (round 3) and
the decode entropy stage. Everything is built ON DEVICE (probe7b stalled for
~45 min on 50 MB host round-trips through the ~30 MB/s tunnel — don't).

Usage: timeout 3000 python tools/tpu_probe7c.py
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
    from jpeg_tpu.ops import bitpack, color, quant, subsample, tile, dct

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img = np.clip(
        np.stack([np.linspace(0, 255, w)] * h)[..., None]
        + rng.integers(-20, 21, (h, w, 3)), 0, 255,
    ).astype(np.uint8)
    mode = Subsampling.YUV420
    qy, qc = jnp.asarray(quant.luma_table(75)), jnp.asarray(quant.chroma_table(75))
    htables = huffman.standard_tables()
    luts = tuple(jnp.asarray(a) for a in bitpack.luts_from_tables(htables))
    dc_code, dc_len, ac_code, ac_len = luts
    dev_img = jax.device_put(jnp.asarray(img))

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    def bench(name, fn, n=8):
        try:
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
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: "
                  + " | ".join(str(e).splitlines()[:4]), flush=True)
            return None

    # ---- transform decomposition -------------------------------------------
    def color_sub(im):
        y, cb, cr = color.rgb_to_ycbcr_planes(im)
        cb = subsample.downsample_plane(cb - 128.0, mode)
        cr = subsample.downsample_plane(cr - 128.0, mode)
        return y - 128.0, cb, cr

    f_cs = jax.jit(color_sub)
    bench("colorsub", lambda: f_cs(dev_img))

    f_full = E._jit_color(mode)
    bench("transform_full", lambda: f_full(dev_img, qy, qc))

    # planes precomputed on device: just the three _plane_zz calls
    planes = jax.block_until_ready(f_cs(dev_img))

    f_pzz = jax.jit(lambda y, cb, cr: (
        E._plane_zz(y, qy, 2, 2), E._plane_zz(cb, qc), E._plane_zz(cr, qc)))
    bench("plane_zz_x3", lambda: f_pzz(*planes))

    # luma only: transpose alone vs transpose+matmul
    f_tr = jax.jit(lambda y: tile.blocks_scan_order(y, 2, 2))
    bench("y_transpose", lambda: f_tr(planes[0]))
    f_mm = jax.jit(lambda y: dct.fdct_zigzag_blocks(tile.blocks_scan_order(y, 2, 2)))
    bench("y_transpose_mm", lambda: f_mm(planes[0]))

    # ---- blocks on device for pack probes ----------------------------------
    f_blocks = jax.jit(lambda im: E._interleaved_blocks(im, qy, qc, mode, 0)[:2])
    blocks_d, tbl_d = jax.block_until_ready(f_blocks(dev_img))
    nblk = blocks_d.shape[0]

    f_bf = jax.jit(lambda b: bitpack.build_bitfields(
        b, tbl_d, dc_code, dc_len, ac_code, ac_len))
    bench("bitfields_2s", lambda: f_bf(blocks_d))

    bits_d, nbits_d = jax.block_until_ready(f_bf(blocks_d))
    nwords = nblk * 8 + 2
    f_pk = jax.jit(lambda b, n: bitpack.pack_bits(b, n, nwords))
    bench("pack_only", lambda: f_pk(bits_d, nbits_d))

    # pack level 1 alone (the one-hot masked reduce)
    def level1(bits, nbits):
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
            axis=1, dtype=jnp.uint32)
        return buf, t_b

    f_l1 = jax.jit(level1)
    bench("pack_level1", lambda: f_l1(bits_d, nbits_d))

    # ---- full packed program (reference; cached from bench) -----------------
    fn_packed = E._jit_color_packed(mode, 0)
    bench("packed_full", lambda: fn_packed(dev_img, qy, qc, *luts))

    # ---- host finalize cost -------------------------------------------------
    out = fn_packed(dev_img, qy, qc, *luts)
    t = int(np.asarray(out[1])[0])
    w_host = np.asarray(out[0][0, : (t + 31) // 32])
    t0 = time.time()
    for _ in range(5):
        scan = bitpack.finalize_segment(w_host, t).tobytes()
    print(f"[host_finalize_segment] {(time.time()-t0)/5*1e3:.2f} ms "
          f"({len(scan)} bytes)", flush=True)

    # ---- decode: indexed stages --------------------------------------------
    from jpeg_tpu.entropy import native, decode_device
    from jpeg_tpu.io import jfif
    from jpeg_tpu.models import layout as L

    comps = [
        jfif.ComponentSpec(1, 2, 2, 0, 0, 0),
        jfif.ComponentSpec(2, 1, 1, 1, 1, 1),
        jfif.ComponentSpec(3, 1, 1, 1, 1, 1),
    ]
    qy_np, qc_np = quant.luma_table(75), quant.chroma_table(75)
    jpg = jfif.write_jpeg(w, h, comps, {0: qy_np, 1: qc_np}, htables, scan)
    info = jfif.parse_jpeg(jpg)
    n_mcu = (h // 16) * (w // 16)
    mcu_layout = [(i, c.h * c.v, c.dc_id, c.ac_id)
                  for i, c in enumerate(info.components)]

    t0 = time.time()
    destuffed, ac_off, dcv = native.index_scan(
        info.scan_data, n_mcu, mcu_layout, info.htables, 0)
    print(f"[host_index] {(time.time()-t0)*1e3:.1f} ms", flush=True)

    # upload cost of index outputs
    t0 = time.time()
    up = (jax.device_put(destuffed), jax.device_put(ac_off),
          jax.device_put(dcv))
    sync(up)
    print(f"[index_upload] {(time.time()-t0)*1e3:.1f} ms "
          f"({destuffed.nbytes + ac_off.nbytes + dcv.nbytes} bytes)",
          flush=True)

    # _indexed_jit program alone, inputs device-resident
    ac_slots = sorted({(1, ac) for (_, _, _, ac) in mcu_layout})
    lut_key = tuple((key, info.htables[key].size.tobytes(),
                     info.htables[key].code.tobytes()) for key in ac_slots)
    packed_dev = decode_device._cached_ac_luts(lut_key, info.htables,
                                               tuple(ac_slots))
    slot_dev = decode_device._cached_slot_array(
        tuple((bpm, 0) for (_, bpm, _, _) in mcu_layout), n_mcu)
    nwords2 = 1 << max(6, (len(destuffed) // 4 + 4).bit_length())
    buf = np.zeros(nwords2 * 4, dtype=np.uint8)
    buf[: len(destuffed)] = destuffed
    words_d = jax.device_put(buf.view(">u4").astype(np.uint32))
    off_d = jax.device_put(ac_off)
    dc_d = jax.device_put(dcv)
    sync((words_d, off_d, dc_d))
    bench("indexed_ac_program", lambda: decode_device._indexed_jit(
        words_d, off_d, dc_d, slot_dev, packed_dev), n=4)

    # full prefix-index device decode (device path end to end)
    bench("prefix_decode_full", lambda: decode_device.decode_scan_prefix(
        info.scan_data, n_mcu, mcu_layout, info.htables)[0], n=2)

    print("done", flush=True)


if __name__ == "__main__":
    main()
