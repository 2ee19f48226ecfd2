"""Probe 7e: the mega-conv transform — color + subsample + DCT + zig-zag +
quantize for a whole 4:2:0 MCU as ONE stride-16 convolution with 384 output
channels (4 luma blocks + Cb + Cr, already interleaved) — plus per-MCU pack
grouping, and the new gather-free AC decode kernel on hardware.

Usage: timeout 3000 python tools/tpu_probe7e.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def mega_kernel_420(qy, qc):
    """(16, 16, 3, 384) f64->f32 conv kernel: out channel blk*64+k of an MCU
    = zig-zag DCT coefficient k of block blk, straight from RGB.
    blk 0..3 = luma (2x2 raster), 4 = Cb, 5 = Cr. Returns (kernel, dc_bias,
    qdiv (384,)) — bias folds the -128 level shift (only DC rows see it)."""
    import jax.numpy as jnp

    from jpeg_tpu import tables
    from jpeg_tpu.ops import color, dct

    d8 = dct.dct_basis().astype(np.float64)
    kron = np.kron(d8, d8)[np.asarray(tables.ZIGZAG_ORDER)]  # (64, 64) zz
    cw = color.RGB_TO_YCBCR.astype(np.float64)  # rows: y, cb, cr
    kern = np.zeros((16, 16, 3, 384), dtype=np.float64)
    for a in range(2):
        for b in range(2):
            blk = a * 2 + b
            for u in range(8):
                for v in range(8):
                    pass  # vectorized below
            # weight[y, x, c, 64*blk + k] = cw[0, c] * kron[k, u*8+v]
            w = kron.reshape(64, 8, 8)  # (k, u, v)
            kern[8*a:8*a+8, 8*b:8*b+8, :, 64*blk:64*blk+64] = (
                np.einsum("kuv,c->uvck", w, cw[0])
            )
    # chroma: 2x2 box mean folded in — each 16x16 tap (y, x) belongs to
    # subsampled position (y//2, x//2) with weight 1/4.
    w = kron.reshape(64, 8, 8)
    for ci, row in ((4, cw[1]), (5, cw[2])):
        full = np.einsum("kuv,c->uvck", w, row)  # (8, 8, 3, 64) on subsampled
        up = np.repeat(np.repeat(full, 2, axis=0), 2, axis=1) * 0.25
        kern[:, :, :, 64*ci:64*ci+64] = up
    # level shift: DC channel k=0 of each block gets -(128 * 8) after the
    # orthonormal DCT (sum/8 - 1024); chroma's +128 offset cancels it exactly
    # for Cb/Cr (their matrix rows sum to 0, offset +128 -> DC += 1024 ...
    # actually offset enters additively: DC_chroma = 8*(mean+128-128)).
    bias = np.zeros(384, dtype=np.float32)
    for blk in range(4):
        bias[64*blk] = -1024.0
    # chroma: stored value = cbcr + 128, level-shifted by -128 -> net 0 bias.
    qzz_y = qy.reshape(64)[np.asarray(tables.ZIGZAG_ORDER)].astype(np.float64)
    qzz_c = qc.reshape(64)[np.asarray(tables.ZIGZAG_ORDER)].astype(np.float64)
    qdiv = np.concatenate([np.tile(qzz_y, 4), qzz_c, qzz_c]).astype(np.float32)
    return (jnp.asarray(kern.astype(np.float32)), jnp.asarray(bias),
            jnp.asarray(qdiv))


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

    HI = jax.lax.Precision.HIGHEST
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

    kern, bias, qdiv = mega_kernel_420(qy_np, qc_np)

    def megaconv(im):
        x = im.astype(jnp.float32)[None]
        out = jax.lax.conv_general_dilated(
            x, kern, window_strides=(16, 16), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=HI,
        )[0].reshape(n_mcu, 384) + bias
        return quant.round_half_away(out / qdiv).astype(jnp.int32)

    f_mc = jax.jit(megaconv)
    bench("megaconv", lambda: f_mc(dev_img))

    # correctness vs the current path (weight-fusion rounding may flip ties)
    f_blocks = jax.jit(lambda im: E._interleaved_blocks(im, qy, qc, mode, 0)[0])
    cur = np.asarray(f_blocks(dev_img)).reshape(n_mcu, 6, 64).copy()
    # undo dpcm on DC for comparison
    for comp_cols in ([0, 1, 2, 3], [4], [5]):
        dcs = cur[:, comp_cols, 0].reshape(-1)
        cur[:, comp_cols, 0] = np.cumsum(dcs).reshape(n_mcu, len(comp_cols))
    new = np.asarray(f_mc(dev_img)).reshape(n_mcu, 6, 64)
    mism = int((cur != new).sum())
    print(f"[megaconv] coeff mismatches vs current: {mism} of {cur.size} "
          f"({100*mism/cur.size:.5f}%)", flush=True)

    # ---- pack grouped per MCU ----------------------------------------------
    blocks_d, tbl_d = jax.block_until_ready(
        jax.jit(lambda im: E._interleaved_blocks(im, qy, qc, mode, 0)[:2])(dev_img))
    f_bf = jax.jit(lambda b: bitpack.build_bitfields(b, tbl_d, *luts))
    bits_d, nbits_d = jax.block_until_ready(f_bf(blocks_d))
    mcu_bits = np.asarray(jnp.sum(nbits_d.reshape(n_mcu, -1), axis=1))
    print(f"[stats] max MCU bits: {mcu_bits.max()}, mean {mcu_bits.mean():.0f}",
          flush=True)
    nwords = blocks_d.shape[0] * 8 + 2

    def pack_mcu(bits, nbits, BW):
        import jax as j

        nb2 = bits.reshape(n_mcu, 6 * 191)
        nn2 = nbits.reshape(n_mcu, 6 * 191).astype(jnp.int32)
        starts = jnp.cumsum(nn2, axis=1) - nn2
        t_b = starts[:, -1] + nn2[:, -1]
        hi, lo = bitpack._field_split(nb2, nn2, starts)
        w_r = jnp.clip(starts >> 5, 0, BW - 1)
        wg = jnp.arange(BW + 1, dtype=jnp.int32)[None, None, :]
        buf = jnp.sum(
            jnp.where(w_r[:, :, None] == wg, hi[:, :, None], jnp.uint32(0))
            + jnp.where((w_r + 1)[:, :, None] == wg, lo[:, :, None],
                        jnp.uint32(0)),
            axis=1, dtype=jnp.uint32)
        off = jnp.cumsum(t_b) - t_b
        total = off[-1] + t_b[-1]
        base = off >> 5
        s2 = (off & 31).astype(jnp.int32)
        zero_col = jnp.zeros((n_mcu, 1), jnp.uint32)
        buf_ext = jnp.concatenate([buf, zero_col], axis=1)
        buf_prev = jnp.concatenate([zero_col, buf], axis=1)
        s2c = s2[:, None]
        contrib = (buf_ext >> s2c.astype(jnp.uint32)) | jnp.where(
            s2c > 0, buf_prev << jnp.clip(32 - s2c, 0, 31).astype(jnp.uint32),
            0)
        words = jnp.zeros(nwords, jnp.int32)
        for k in range(BW + 2):
            raw = base + k
            val = jnp.where(raw < nwords, contrib[:, k], jnp.uint32(0))
            words = words + j.ops.segment_sum(
                j.lax.bitcast_convert_type(val, jnp.int32),
                jnp.minimum(raw, nwords - 1),
                num_segments=nwords, indices_are_sorted=True)
        words = j.lax.bitcast_convert_type(words, jnp.uint32)
        ok = (jnp.max(t_b) <= BW * 32) & (total <= nwords * 32)
        return words, total, ok

    for BW in (12, 16):
        f = jax.jit(lambda b, n, BW=BW: pack_mcu(b, n, BW))
        bench(f"pack_mcu_bw{BW}", lambda f=f: f(bits_d, nbits_d))
        wo, to, ok = f(bits_d, nbits_d)
        print(f"[pack_mcu_bw{BW}] ok={bool(np.asarray(ok))}", flush=True)
        f9 = jax.jit(lambda b, n: bitpack.pack_bits(b, n, nwords))
        wr, tr, okr = f9(bits_d, nbits_d)
        same = bool(np.asarray(jnp.all(wo == wr)) and np.asarray(to == tr))
        print(f"[pack_mcu_bw{BW}] words identical to block pack: {same}",
              flush=True)

    # ---- new gather-free AC decode kernel on hardware -----------------------
    from jpeg_tpu import decode, encode
    from jpeg_tpu.io import jfif
    from jpeg_tpu.models import layout as L
    from jpeg_tpu.entropy import native, decode_device

    fnp = E._jit_color_packed(mode, 0)
    wo, to, ok = fnp(dev_img, qy, qc, *luts)
    t = int(np.asarray(to)[0])
    scan = bitpack.finalize_segment(
        np.asarray(wo[0, : (t + 31) // 32]), t).tobytes()
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
    ac_slots = sorted({(1, ac) for (_, _, _, ac) in ml})
    lut_key = tuple((key, info.htables[key].size.tobytes(),
                     info.htables[key].code.tobytes()) for key in ac_slots)
    canon = decode_device._cached_canonical(lut_key, info.htables,
                                            tuple(ac_slots))
    slot_dev = decode_device._cached_slot_array(
        tuple((bpm, 0) for (_, bpm, _, _) in ml), n_mcu)
    nwords2 = 1 << max(6, (len(destuffed) // 4 + 4).bit_length())
    buf = np.zeros(nwords2 * 4, dtype=np.uint8)
    buf[: len(destuffed)] = destuffed
    words_d = jax.device_put(buf.view(">u4").astype(np.uint32))
    off_d = jax.device_put(ac_off)
    dc_d = jax.device_put(dcv)
    sync((words_d, off_d, dc_d))
    bench("ac_kernel_gatherfree", lambda: decode_device._indexed_jit(
        words_d, off_d, dc_d, slot_dev, *canon), n=4)

    print("done", flush=True)


if __name__ == "__main__":
    main()
