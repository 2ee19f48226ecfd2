"""Probe 7d: candidate fixes for the three measured hot spots of probe 7c —
colorsub (21.6 ms: strided u8 channel loads), the blocks_scan_order transpose
(7.9 ms), and pack level 2 (19 ms scatter).

Usage: timeout 3000 python tools/tpu_probe7d.py
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
    from jpeg_tpu.ops import bitpack, color, dct, quant, tile

    HI = jax.lax.Precision.HIGHEST
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img = np.clip(
        np.stack([np.linspace(0, 255, w)] * h)[..., None]
        + rng.integers(-20, 21, (h, w, 3)), 0, 255,
    ).astype(np.uint8)
    mode = Subsampling.YUV420
    qy_np = quant.luma_table(75)
    qy, qc = jnp.asarray(qy_np), jnp.asarray(quant.chroma_table(75))
    htables = huffman.standard_tables()
    luts = tuple(jnp.asarray(a) for a in bitpack.luts_from_tables(htables))
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

    # ---- colorsub variants --------------------------------------------------
    def cs_cur(im):
        y, cb, cr = color.rgb_to_ycbcr_planes(im)
        cb = (cb - 128.0).reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = (cr - 128.0).reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        return y - 128.0, cb, cr

    bench("cs_cur", lambda: jax.jit(cs_cur)(dev_img))

    def cs_mm(im):
        ycc = color.rgb_to_ycbcr(im) - 128.0
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        return y, cb, cr

    bench("cs_mm", lambda: jax.jit(cs_mm)(dev_img))

    def cs_small(im):
        # Downsample RGB first (box mean commutes with the linear map), then
        # only the chroma rows of the matrix on the quarter-size plane.
        x = im.astype(jnp.float32)
        wy = jnp.asarray(color.RGB_TO_YCBCR[0])
        y = jnp.einsum("hwc,c->hw", x, wy, precision=HI) - 128.0
        small = x.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
        mcbcr = jnp.asarray(color.RGB_TO_YCBCR[1:].T)
        cbcr = jnp.matmul(small, mcbcr, precision=HI)
        return y, cbcr[..., 0], cbcr[..., 1]

    bench("cs_small", lambda: jax.jit(cs_small)(dev_img))

    def cs_tr(im):
        p = im.astype(jnp.float32).transpose(2, 0, 1)
        r_, g_, b_ = p[0], p[1], p[2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_ - 128.0
        cb = -0.168735892 * r_ - 0.331264108 * g_ + 0.5 * b_
        cr = 0.5 * r_ - 0.418687589 * g_ - 0.081312411 * b_
        cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        return y, cb, cr

    bench("cs_transpose_first", lambda: jax.jit(cs_tr)(dev_img))

    # ---- DCT variants on the luma plane ------------------------------------
    yf = jax.block_until_ready(jax.jit(cs_cur)(dev_img))[0]
    m_zz = jnp.asarray(dct.zigzag_dct_matrix())
    q_zz = jnp.asarray(
        qy_np.reshape(64)[np.argsort(np.argsort(np.arange(64)))]  # placeholder
    )
    from jpeg_tpu import tables
    q_zz = jnp.asarray(qy_np.reshape(64)[np.asarray(tables.ZIGZAG_ORDER)]
                       .astype(np.float32))

    def dct_tr_mm(p):
        flat = tile.blocks_scan_order(p, 2, 2)
        zz = dct.fdct_zigzag_blocks(flat)
        return quant.round_half_away(zz / q_zz).astype(jnp.int32)

    bench("dct_tr_mm", lambda: jax.jit(dct_tr_mm)(yf))

    kern = jnp.asarray(
        dct.zigzag_dct_matrix().reshape(64, 8, 8).transpose(1, 2, 0)[:, :, None, :]
    )  # (8, 8, 1, 64) HWIO

    def dct_conv(p):
        x = p[None, :, :, None]  # NHWC
        out = jax.lax.conv_general_dilated(
            x, kern, window_strides=(8, 8), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=HI,
        )[0]  # (Hb, Wb, 64)
        hb, wb = out.shape[0], out.shape[1]
        scan = out.reshape(hb // 2, 2, wb // 2, 2, 64).transpose(
            0, 2, 1, 3, 4).reshape(-1, 64)
        return quant.round_half_away(scan / q_zz).astype(jnp.int32)

    f_conv = jax.jit(dct_conv)
    bench("dct_conv", lambda: f_conv(yf))
    mism = int(np.asarray(jnp.sum(f_conv(yf) != jax.jit(dct_tr_mm)(yf))))
    print(f"[dct_conv] mismatches vs tr_mm: {mism}", flush=True)

    # ---- pack level 2 variants ---------------------------------------------
    f_blocks = jax.jit(lambda im: E._interleaved_blocks(im, qy, qc, mode, 0)[:2])
    blocks_d, tbl_d = jax.block_until_ready(f_blocks(dev_img))
    nblk = blocks_d.shape[0]
    f_bf = jax.jit(lambda b: bitpack.build_bitfields(
        b, tbl_d, *luts))
    bits_d, nbits_d = jax.block_until_ready(f_bf(blocks_d))
    print("[stats] max block bits:",
          int(np.asarray(jnp.max(jnp.sum(nbits_d, axis=1)))), flush=True)
    nwords = nblk * 8 + 2
    f_pk = jax.jit(lambda b, n: bitpack.pack_bits(b, n, nwords))
    bench("pack_cur", lambda: f_pk(bits_d, nbits_d))

    def pack_bw(bits, nbits, BW):
        """pack_bits with a narrower per-block word budget."""
        nbits = nbits.astype(jnp.int32)
        nb = bits.shape[0]
        starts = jnp.cumsum(nbits, axis=1) - nbits
        t_b = starts[:, -1] + nbits[:, -1]
        hi, lo = bitpack._field_split(bits, nbits, starts)
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
        zero_col = jnp.zeros((nb, 1), jnp.uint32)
        buf_ext = jnp.concatenate([buf, zero_col], axis=1)
        buf_prev = jnp.concatenate([zero_col, buf], axis=1)
        s2c = s2[:, None]
        contrib = (buf_ext >> s2c.astype(jnp.uint32)) | jnp.where(
            s2c > 0, buf_prev << jnp.clip(32 - s2c, 0, 31).astype(jnp.uint32), 0)
        words = jnp.zeros(nwords, jnp.int32)
        for k in range(BW + 2):
            raw = base + k
            val = jnp.where(raw < nwords, contrib[:, k], jnp.uint32(0))
            words = words + jax.ops.segment_sum(
                jax.lax.bitcast_convert_type(val, jnp.int32),
                jnp.minimum(raw, nwords - 1),
                num_segments=nwords, indices_are_sorted=True)
        words = jax.lax.bitcast_convert_type(words, jnp.uint32)
        ok = (jnp.max(t_b) <= BW * 32) & (total <= nwords * 32)
        return words, total, ok

    for BW in (4, 6):
        f = jax.jit(lambda b, n, BW=BW: pack_bw(b, n, BW))
        bench(f"pack_bw{BW}", lambda f=f: f(bits_d, nbits_d))
        wo, to, ok = f(bits_d, nbits_d)
        print(f"[pack_bw{BW}] ok={bool(np.asarray(ok))}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
