"""Probe 7f: same-session A/B of the indexed AC decode kernels (round-2
gather kernel vs round-3 gather-free canonical kernel) plus today's dispatch
floor and transfer rate — cross-session comparisons are meaningless because
the tunnel's speed varies ~3x day to day.

Usage: timeout 3000 python tools/tpu_probe7f.py
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
    from jpeg_tpu.entropy.decode_device import _extend
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

    # today's floor + transfer rate
    tiny = jax.jit(lambda x: x + 1)
    zz1 = jax.device_put(jnp.zeros((8, 128), jnp.int32))
    bench("dispatch_floor", lambda: tiny(zz1), n=8)
    t0 = time.time()
    big = jax.device_put(jnp.asarray(img))
    sync(big)
    print(f"[h2d_24MB] {(time.time()-t0)*1e3:.0f} ms", flush=True)

    # make the scan + index
    fnp = E._jit_color_packed(mode, 0)
    out = fnp(dev_img, qy, qc, *luts)
    ok = bool(np.asarray(out[2]).all())
    print(f"[packed] mcu-group ok={ok}", flush=True)
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
    packed_luts = decode_device._cached_ac_luts(lut_key, info.htables,
                                                ac_slots)
    slot_dev = decode_device._cached_slot_array(
        tuple((bpm, 0) for (_, bpm, _, _) in ml), n_mcu)
    nwords2 = 1 << max(6, (len(destuffed) // 4 + 4).bit_length())
    buf = np.zeros(nwords2 * 4, dtype=np.uint8)
    buf[: len(destuffed)] = destuffed
    t0 = time.time()
    words_d = jax.device_put(buf.view(">u4").astype(np.uint32))
    off_d = jax.device_put(ac_off)
    dc_d = jax.device_put(dcv)
    sync((words_d, off_d, dc_d))
    print(f"[index_upload_3calls] {(time.time()-t0)*1e3:.0f} ms", flush=True)
    t0 = time.time()
    packed_ul = jax.device_put(
        np.concatenate([ac_off[:, None], dcv[:, None]], axis=1).astype(np.int32))
    sync(packed_ul)
    print(f"[index_upload_1call] {(time.time()-t0)*1e3:.0f} ms", flush=True)

    bench("ac_new_gatherfree", lambda: decode_device._indexed_jit(
        words_d, off_d, dc_d, slot_dev, *canon))

    # ---- the round-2 gather kernel, verbatim --------------------------------
    def ac_old(words, off, dc, slot, packed_luts):
        B = off.shape[0]
        rows0 = jnp.zeros((B, 64), jnp.int32).at[:, 0].set(dc)
        kcol = jnp.arange(64, dtype=jnp.int32)[None, :]
        pairs = jnp.stack(
            [words, jnp.concatenate([words[1:], words[:1]])], axis=1)

        def cond(st):
            return ~jnp.all(st[0] >= 64)

        def body(st):
            k, pos, rows = st
            wp = pairs[pos >> 5]
            w0, w1 = wp[:, 0], wp[:, 1]
            sh = (pos & 31).astype(jnp.uint32)
            win = jnp.where(
                sh == 0, w0, (w0 << sh) | (w1 >> ((jnp.uint32(32) - sh) & 31)))
            top = (win >> 16).astype(jnp.int32)
            packed = packed_luts[slot, top]
            sym = jnp.maximum((packed << 16) >> 16, 0)
            ln = packed >> 16
            run, size = sym >> 4, sym & 15
            shift = (32 - ln - size).astype(jnp.uint32)
            amp = ((win >> shift)
                   & ((jnp.uint32(1) << size.astype(jnp.uint32)) - 1)
                   ).astype(jnp.int32)
            val = _extend(amp, size)
            is_eob = sym == 0
            is_zrl = sym == 0xF0
            active = k < 64
            kw = k + run
            emit = active & ~is_eob & ~is_zrl & (kw <= 63)
            rows = rows + jnp.where(
                emit[:, None] & (kcol == kw[:, None]), val[:, None], 0)
            pos = jnp.where(active, pos + ln + size, pos)
            k = jnp.where(
                active,
                jnp.where(is_eob, 64, jnp.where(is_zrl, k + 16, kw + 1)), k)
            return k, pos, rows

        init = (jnp.ones((B,), jnp.int32), off, rows0)
        return jax.lax.while_loop(cond, body, init)[2]

    f_old = jax.jit(ac_old)
    bench("ac_old_gather", lambda: f_old(
        words_d, off_d, dc_d, slot_dev, packed_luts))
    a = f_old(words_d, off_d, dc_d, slot_dev, packed_luts)
    b = decode_device._indexed_jit(words_d, off_d, dc_d, slot_dev, *canon)
    print("[ab] identical:", bool(np.asarray(jnp.all(a == b))), flush=True)

    # finish program (cached from bench)
    from jpeg_tpu.models.decoder import _jit_finish_color
    from jpeg_tpu.models import layout as L

    shapes = ((135 * 2, 240 * 2), (135, 240), (135, 240))
    factors = ((1, 1), (2, 2), (2, 2))
    ffn = _jit_finish_color(shapes, factors)
    zzr = [L.scan_to_raster(b[:n_mcu * 4], 135, 240, 2, 2),
           b[n_mcu * 4:n_mcu * 5], b[n_mcu * 5:]]
    qts = [qy, qc, qc]
    bench("finish", lambda: ffn(*zzr, *qts))

    print("done", flush=True)


if __name__ == "__main__":
    main()
