"""Probe 7b: the pack half (bitfields + level1/2) and the candidate fused
transform for round 3. Continues tpu_probe7.py past its read-only crash.

Usage: timeout 3600 python tools/tpu_probe7b.py
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

    from jpeg_tpu import tables
    from jpeg_tpu.config import Subsampling
    from jpeg_tpu.entropy import huffman
    from jpeg_tpu.models import encoder as E
    from jpeg_tpu.ops import bitpack, dct, dpcm as dpcm_ops, quant, symbols

    HI = jax.lax.Precision.HIGHEST
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img = np.clip(
        np.stack([np.linspace(0, 255, w)] * h)[..., None]
        + rng.integers(-20, 21, (h, w, 3)), 0, 255,
    ).astype(np.uint8)
    mode = Subsampling.YUV420
    qy_np, qc_np = quant.luma_table(75), quant.chroma_table(75)
    qy, qc = jnp.asarray(qy_np), jnp.asarray(qc_np)
    htables = huffman.standard_tables()
    luts = tuple(jnp.asarray(a) for a in bitpack.luts_from_tables(htables))
    dc_code, dc_len, ac_code, ac_len = luts
    geom = E._packed_geometry(h // 16, w // 16, mode)
    perm_y, gather, tbl_arr = geom
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
            print(f"[{name}] {best*1e3:.2f} ms/call (x{n} pipelined)",
                  flush=True)
            return best
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: "
                  + " | ".join(str(e).splitlines()[:4]), flush=True)
            return None

    f_cur = E._jit_color(mode)
    y_zz_d, cb_zz_d, cr_zz_d = f_cur(dev_img, qy, qc)
    blocks_d = jnp.concatenate(
        [y_zz_d[perm_y], cb_zz_d, cr_zz_d], axis=0)[gather]
    blk_np = np.asarray(blocks_d).copy()
    blk_np[:, 0] = np.concatenate([[blk_np[0, 0]], np.diff(blk_np[:, 0])])
    blocks_dp = jax.device_put(jnp.asarray(blk_np))
    sync(blocks_dp)

    # ---- bitfields: current vs two-stage ------------------------------------
    f_bf = jax.jit(lambda b: bitpack.build_bitfields(
        b, tbl_arr, dc_code, dc_len, ac_code, ac_len))
    bench("bitfields_cur", lambda: f_bf(blocks_dp))

    def build_bitfields_2s(blocks, tblv):
        blocks = blocks.astype(jnp.int32)
        tblv = tblv.astype(jnp.int32)
        dc = blocks[:, 0]
        dsize = symbols.bit_size(dc)
        dc_tab = bitpack._split_cols(dc_code[:, :16].reshape(32),
                                     dc_len[:, :16].reshape(32))
        dcode, dlen = bitpack._onehot_lookup(tblv * 16 + dsize, dc_tab, 32)
        dbits = (dcode << dsize.astype(jnp.uint32)) | bitpack._amp_bits(dc, dsize)
        dnbits = dlen + dsize

        nz, run, last_nz = symbols.ac_run_lengths(blocks)
        nz = nz[:, 1:]
        run = jnp.where(nz, run[:, 1:], 0)
        v = blocks[:, 1:]
        size = jnp.where(nz, symbols.bit_size(v), 0)
        r4 = run & 15
        t1 = (ac_code.astype(jnp.float32) * 32.0
              + ac_len.astype(jnp.float32)).reshape(32, 16)
        oh = jax.nn.one_hot(tblv[:, None] * 16 + r4, 32, dtype=jnp.float32)
        cand = jax.lax.dot_general(oh, t1, (((2,), (0,)), ((), ())),
                                   precision=HI,
                                   preferred_element_type=jnp.float32)
        sel = jnp.sum(
            cand * jax.nn.one_hot(size, 16, dtype=jnp.float32), axis=-1)
        packed = sel.astype(jnp.int32)
        code = (packed >> 5).astype(jnp.uint32)
        aclen = packed & 31
        clen = jnp.where(nz, aclen, 0)
        cbits = jnp.where(
            nz, (code << size.astype(jnp.uint32)) | bitpack._amp_bits(v, size), 0)
        cn = clen + size

        is1 = tblv[:, None] == 1
        zc = jnp.where(is1, ac_code[1, 0xF0], ac_code[0, 0xF0])
        zl = jnp.where(is1, ac_len[1, 0xF0], ac_len[0, 0xF0])
        kz = jnp.where(nz, run >> 4, 0)
        pair = (zc << zl.astype(jnp.uint32)) | zc
        n0 = jnp.minimum(kz, 2) * zl
        b0 = jnp.where(kz >= 2, pair, jnp.where(kz == 1, zc, 0))
        n1 = jnp.maximum(kz - 2, 0) * zl
        b1 = jnp.where(kz >= 3, zc, 0)
        eob = last_nz < 63
        e1 = tblv == 1
        ebits = jnp.where(eob, jnp.where(e1, ac_code[1, 0], ac_code[0, 0]), 0)
        enbits = jnp.where(eob, jnp.where(e1, ac_len[1, 0], ac_len[0, 0]), 0)
        nb = blocks.shape[0]
        ac_bits = jnp.stack([b0, b1, cbits], axis=-1).reshape(nb, 189)
        ac_nbits = jnp.stack([n0, n1, cn], axis=-1).reshape(nb, 189)
        bits = jnp.concatenate([dbits[:, None], ac_bits, ebits[:, None]], axis=1)
        nbits = jnp.concatenate(
            [dnbits[:, None], ac_nbits, enbits[:, None]], axis=1)
        return bits, nbits

    f_bf2 = jax.jit(lambda b: build_bitfields_2s(b, tbl_arr))
    bench("bitfields_2stage", lambda: f_bf2(blocks_dp))
    a0, a1 = f_bf(blocks_dp)
    b0_, b1_ = f_bf2(blocks_dp)
    mism = int(np.asarray(jnp.sum(a0 != b0_) + jnp.sum(a1 != b1_)))
    print(f"[bitfields_2stage] mismatches: {mism}", flush=True)

    # ---- pack level 1+2 alone ----------------------------------------------
    bits_d, nbits_d = jax.block_until_ready(f_bf(blocks_dp))
    nblk = blocks_dp.shape[0]
    nwords = nblk * 8 + 2
    f_pk = jax.jit(lambda b, n: bitpack.pack_bits(b, n, nwords))
    bench("pack_only", lambda: f_pk(bits_d, nbits_d))

    # ---- full candidate: new transform end-to-end ---------------------------
    d8 = dct.dct_basis().astype(np.float64)
    kron = np.kron(d8, d8)
    zz_ord = np.asarray(tables.ZIGZAG_ORDER)
    m_zz = jnp.asarray(kron[zz_ord].astype(np.float32))
    qzy = jnp.asarray(qy_np.reshape(64)[zz_ord].astype(np.float32))
    qzc = jnp.asarray(qc_np.reshape(64)[zz_ord].astype(np.float32))
    R, C = h // 16, w // 16
    n_mcu = R * C

    def plane_blocks_scan(p, hb_groups, wb_groups):
        """(H, W) f32 plane -> (B, 64) spatial block rows in MCU-scan order:
        one transpose folding blockify + scan-order."""
        hh, ww = p.shape
        hb, wb = hh // 8, ww // 8
        v, hf = hb_groups, wb_groups
        x = p.reshape(hb // v, v, 8, wb // hf, hf, 8)
        return x.transpose(0, 3, 1, 4, 2, 5).reshape(-1, 64)

    def new_transform(rgb, qzy, qzc):
        x = rgb.astype(jnp.float32)
        r_, g_, b_ = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_ - 128.0
        cb = -0.168735892 * r_ - 0.331264108 * g_ + 0.5 * b_
        cr = 0.5 * r_ - 0.418687589 * g_ - 0.081312411 * b_
        cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

        def zzq(p, qz, v, hf):
            blk = plane_blocks_scan(p, v, hf)
            co = jax.lax.dot_general(blk, m_zz, (((1,), (1,)), ((), ())),
                                     precision=HI,
                                     preferred_element_type=jnp.float32)
            return quant.round_half_away(co / qz).astype(jnp.int32)

        yz = zzq(y, qzy, 2, 2)
        cbz = zzq(cb, qzc, 1, 1)
        crz = zzq(cr, qzc, 1, 1)
        yz = yz.at[:, 0].set(dpcm_ops.dpcm(yz[:, 0], 0))
        cbz = cbz.at[:, 0].set(dpcm_ops.dpcm(cbz[:, 0], 0))
        crz = crz.at[:, 0].set(dpcm_ops.dpcm(crz[:, 0], 0))
        return jnp.concatenate(
            [yz.reshape(n_mcu, 4, 64), cbz[:, None], crz[:, None]], axis=1
        ).reshape(-1, 64)

    f_new = jax.jit(lambda im: new_transform(im, qzy, qzc))
    bench("new_transform_full", lambda: f_new(dev_img))

    # ---- new full packed program (transform + 2stage bitfields + pack) ------
    def new_packed(rgb):
        blocks = new_transform(rgb, qzy, qzc)
        bits, nbits = build_bitfields_2s(blocks, tbl_arr)
        return bitpack.pack_bits(bits, nbits, nwords)

    f_np_ = jax.jit(new_packed)
    bench("new_packed_full", lambda: f_np_(dev_img))

    # correctness of the full new packed vs current packed program
    fn_packed = E._jit_color_packed(mode, 0)
    wo, to, ok = fn_packed(dev_img, qy, qc, *luts, *geom)
    wn, tn, okn = f_np_(dev_img)
    print(f"[new_packed] totals cur={int(np.asarray(to)[0])} "
          f"new={int(np.asarray(tn))} ok={bool(np.asarray(okn))}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
