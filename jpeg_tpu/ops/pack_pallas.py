"""Experimental Pallas kernel: coefficient blocks -> packed per-block word
buffers, fully fused in VMEM (roadmap item 1 in docs/DESIGN.md §6).

The XLA two-level packer (ops/bitpack.py) materializes ~500 MB of intermediate
field arrays in HBM for a 4K image; this kernel keeps everything — magnitude
classes, Huffman lookups (as one-hot MXU dots), ZRL channel split, within-block
prefix sums and the one-hot word reduction — inside VMEM, emitting only the
(B, BLOCK_WORDS) buffers and per-block bit totals. Level 2 (global offsets +
~11 scatter updates per block) stays in XLA where it is already cheap.

Status (round 4): the two-stage 32-wide lookup restructure (mirroring the
XLA packer's bitpack.py fix) made the kernel COMPILE on the real v5e at
TILE=16 — the round-2/3 Mosaic OOM is gone — and its buffers/totals are
bit-exact vs the XLA level 1 on hardware. But it measured 154.5 ms for a 4K
block array vs 15.7 ms for the XLA formulation (12K tiny grid steps; lane
dim 64 half-fills the vregs), and TILE >= 64 still fails the remote Mosaic
compile (helper exit 1). The axis is closed as a measured negative result
(docs/DESIGN.md §6 round-4 log): production stays on the XLA packer; this
module remains the `use_pallas_pack=True` opt-in appendix, now validated on
hardware rather than only in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_tpu.ops.bitpack import BLOCK_WORDS

TILE = 16  # blocks per grid step (one-hot intermediates are (TILE, 63, 1024))


def _bit_size(mag):
    """Magnitude category via thresholds (no transcendentals): bits in mag."""
    size = jnp.zeros_like(mag)
    for k in range(12):
        size = size + (mag >= (1 << k)).astype(mag.dtype)
    return size


def _cummax_lanes(x):
    """Inclusive row-wise cummax of non-negative (R, C) int32.

    Mosaic has no lowering for lax.cummax; log-doubling shift+max over the
    lane axis uses only ops it does support (C static).
    """
    r, c = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    s = 1
    while s < c:
        rolled = pltpu.roll(x, s, 1)
        x = jnp.maximum(x, jnp.where(col >= s, rolled, 0))
        s *= 2
    return x


def _cumsum_lanes(x):
    """Inclusive row-wise cumsum of small non-negative (R, C) int32 via a
    lower-triangular MXU matmul (exact in f32: row sums here are < 2^11)."""
    c = x.shape[1]
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    ).astype(jnp.float32)
    # HIGHEST: default MXU precision is bf16 passes — exact only to 2^8, and
    # these prefix sums reach 2^11. (Interpret-mode tests run f32 either way;
    # only the hardware path would silently corrupt.)
    out = jax.lax.dot_general(
        x.astype(jnp.float32), tri,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(jnp.int32)


def _kernel(blocks_ref, tbl_ref, ac_t1_ref, dc_t_ref, buf_ref, total_ref,
            *, tile: int):
    v = blocks_ref[:]  # (tile, 64) int32
    tb16 = tbl_ref[:]  # (tile, 1) int32: table id * 16
    ac_t1 = ac_t1_ref[:]  # (32, 16) f32: code*32+len by [(tbl, run), size]
    dc_t = dc_t_ref[:]  # (32, 1) f32: code*32+len by (tbl, size)

    # All bit manipulation in int32 (Mosaic lowers unsigned casts poorly);
    # shifts that must not replicate the sign bit use shift_right_logical,
    # and the caller bitcasts the packed words to uint32.
    mag = jnp.abs(v)
    size = _bit_size(mag)
    amp_full = jnp.where(v >= 0, v, v + (1 << size) - 1)
    amp = amp_full & ((jnp.int32(1) << size) - 1)

    # Zero-run lengths over AC positions (cummax of nonzero indices).
    idx = jax.lax.broadcasted_iota(jnp.int32, (tile, 64), 1)
    nz = (v != 0) & (idx > 0)
    markers = jnp.where(nz, idx, 0)
    cmax = _cummax_lanes(markers)
    prev = jnp.concatenate(
        [jnp.zeros((tile, 1), jnp.int32), cmax[:, :-1]], axis=1
    )
    run = jnp.where(nz, idx - prev - 1, 0)
    last_nz = cmax[:, -1:]

    # Huffman lookups as TWO-STAGE one-hot MXU dots (round-4 restructure,
    # VERDICT item 6): stage 1 one-hots only (tbl, run) — 32 wide — into 16
    # size-candidates per element; stage 2 selects by size elementwise. The
    # round-2/3 merged-table form materialized (tile, 63, 1024) one-hots,
    # which OOM-killed the Mosaic compile; these are 32x smaller — the exact
    # restructuring that already fixed the XLA packer (bitpack.py).
    # HIGHEST: packed values reach 2^21; default bf16 MXU passes are exact
    # only to 2^8 and would silently corrupt codes on hardware.
    def lut32(idx, table):  # (tile, n) int32 in [0,32) -> packed i32
        oh = jax.nn.one_hot(idx, 32, dtype=jnp.float32)  # (tile, n, 32)
        p = jax.lax.dot_general(
            oh, table,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (tile, n, table.shape[1])
        return p

    # DC records: 32-wide one-hot over (tbl, size).
    dsize = size[:, :1]
    dcp = lut32(tb16 + dsize, dc_t)[:, :, 0].astype(jnp.int32)
    dc_code = jax.lax.shift_right_logical(dcp, 5)
    dc_len = dcp & 31
    dbits = (dc_code << dsize) | amp[:, :1]
    dnbits = dc_len + dsize

    # AC (run, size) records: stage 1 over (tbl, run), stage 2 size select.
    cand = lut32(tb16 + (run & 15)[:, 1:], ac_t1)  # (tile, 63, 16)
    size_oh = jax.nn.one_hot(size[:, 1:], 16, dtype=jnp.float32)
    acp = jnp.sum(cand * size_oh, axis=-1).astype(jnp.int32)
    ac_code = jnp.where(nz[:, 1:], jax.lax.shift_right_logical(acp, 5), 0)
    ac_len = jnp.where(nz[:, 1:], acp & 31, 0)
    cbits = (ac_code << size[:, 1:]) | jnp.where(nz[:, 1:], amp[:, 1:], 0)
    cn = ac_len + jnp.where(nz[:, 1:], size[:, 1:], 0)

    # ZRL channels: symbol 0xF0 = (run 15, size 0) -> ac_t1 row tb16+15,
    # column 0.
    zp = lut32(tb16 + 15, ac_t1)[:, :, 0].astype(jnp.int32)  # (tile, 1)
    zrl_code = jax.lax.shift_right_logical(zp, 5)
    zrl_len = zp & 31
    kz = jnp.where(nz, run >> 4, 0)[:, 1:]
    pair = (zrl_code << zrl_len) | zrl_code
    n0 = jnp.minimum(kz, 2) * zrl_len
    b0 = jnp.where(kz >= 2, pair, jnp.where(kz == 1, zrl_code, 0))
    n1 = jnp.maximum(kz - 2, 0) * zrl_len
    b1 = jnp.where(kz >= 3, zrl_code, 0)

    # EOB: symbol 0 = (run 0, size 0) -> ac_t1 row tb16, column 0.
    ep = lut32(tb16, ac_t1)[:, :, 0].astype(jnp.int32)
    has_eob = last_nz < 63
    ebits = jnp.where(has_eob, jax.lax.shift_right_logical(ep, 5), 0)
    enbits = jnp.where(has_eob, ep & 31, 0)

    # Emission order: [DC | (zrl_pair, zrl_single, code)x63 | EOB] = 191.
    # Mosaic rejects the (tile, 63, 3) -> (tile, 189) interleave reshape, so
    # instead of materializing the interleaved record stream, compute each
    # channel's start offsets arithmetically from ONE cumsum over per-slot
    # totals and accumulate the word buffer channel by channel (the per-slot
    # emission order b0 -> b1 -> code is encoded in the offset arithmetic).
    t_slot = n0 + n1 + cn
    p_incl = _cumsum_lanes(t_slot)
    s0 = dnbits + (p_incl - t_slot)
    s1 = s0 + n0
    s2 = s1 + n1
    se = dnbits + p_incl[:, 62:63]
    t_b = (se + enbits)[:, 0]

    wg = jnp.arange(BLOCK_WORDS + 1, dtype=jnp.int32)[None, None, :]

    def emit(bits, nbits, starts):
        """Word-buffer contribution of one record channel (level 1)."""
        sh = starts & 31
        over = jnp.maximum(sh + nbits - 32, 0)
        # Record values never fill 32 bits on their own here, but the composed
        # ZRL pair can set bit 31; logical right shift keeps packing exact.
        hi = jnp.where(
            over > 0,
            jax.lax.shift_right_logical(bits, over),
            jax.lax.shift_left(bits, jnp.clip(32 - sh - nbits, 0, 31)),
        )
        lo = jnp.where(
            over > 0, jax.lax.shift_left(bits, jnp.clip(32 - over, 0, 31)), 0
        )
        w_r = jnp.clip(starts >> 5, 0, BLOCK_WORDS - 1)
        # Disjoint bit fields: int32 adds never carry across contributions,
        # so the bit pattern equals the uint32 sum.
        return jnp.sum(
            jnp.where(w_r[:, :, None] == wg, hi[:, :, None], 0)
            + jnp.where((w_r + 1)[:, :, None] == wg, lo[:, :, None], 0),
            axis=1,
            dtype=jnp.int32,
        )

    buf = (
        emit(dbits, dnbits, jnp.zeros_like(dnbits))
        + emit(b0, n0, s0)
        + emit(b1, n1, s1)
        + emit(cbits, cn, s2)
        + emit(ebits, enbits, se)
    )
    buf_ref[:] = buf
    total_ref[:] = t_b[:, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_level1_pallas(blocks, tbl, dc_code, dc_len, ac_code, ac_len,
                       interpret: bool = False):
    """(B, 64) int32 zig-zag blocks (DC already DPCM'd) + (B,) table ids +
    (2, 256) LUTs -> ((B, BLOCK_WORDS+1) uint32 buffers, (B,) int32 totals).

    Drop-in replacement for bitpack.build_bitfields + level 1 of
    bitpack.pack_bits; feed the result to level 2 for the global stream.
    """
    b = blocks.shape[0]
    pad = (-b) % TILE
    if pad:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad, 64), blocks.dtype)], axis=0
        )
        tbl = jnp.concatenate([tbl, jnp.zeros((pad,), tbl.dtype)], axis=0)
    bp = blocks.shape[0]

    # Two-stage lookup tables, packed code*32+len (<= 2^21, exact in f32):
    # ac_t1 (32, 16) by [(tbl, run), size]; dc_t (32, 1) by (tbl, size).
    ac_t1 = (ac_code.astype(jnp.float32) * 32.0
             + ac_len.astype(jnp.float32)).reshape(32, 16)
    dc_t = (dc_code[:, :16].astype(jnp.float32) * 32.0
            + dc_len[:, :16].astype(jnp.float32)).reshape(32, 1)

    buf, total = pl.pallas_call(
        functools.partial(_kernel, tile=TILE),
        out_shape=(
            jax.ShapeDtypeStruct((bp, BLOCK_WORDS + 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
        ),
        grid=(bp // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, BLOCK_WORDS + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        blocks.astype(jnp.int32),
        (tbl.astype(jnp.int32) * 16)[:, None],
        ac_t1,
        dc_t,
    )
    return jax.lax.bitcast_convert_type(buf[:b], jnp.uint32), total[:b, 0]


def pack_level2(buf, t_b, nwords: int):
    """Global assembly: shift per-block buffers to their stream offsets and
    scatter-add (level 2 of ops/bitpack.pack_bits, operating on kernel output).
    Returns (words, total_bits, ok)."""
    nblocks = buf.shape[0]
    off = jnp.cumsum(t_b) - t_b
    total = off[-1] + t_b[-1]
    base = off >> 5
    s2 = (off & 31).astype(jnp.int32)

    zero_col = jnp.zeros((nblocks, 1), jnp.uint32)
    buf_ext = jnp.concatenate([buf, zero_col], axis=1)
    buf_prev = jnp.concatenate([zero_col, buf], axis=1)
    s2c = s2[:, None]
    contrib = (buf_ext >> s2c.astype(jnp.uint32)) | jnp.where(
        s2c > 0, buf_prev << jnp.clip(32 - s2c, 0, 31).astype(jnp.uint32), 0
    )
    ncols = buf.shape[1] + 1
    idx = base[:, None] + jnp.arange(ncols, dtype=jnp.int32)[None, :]
    words = jnp.zeros(nwords, jnp.uint32)
    words = words.at[idx.reshape(-1)].add(contrib.reshape(-1), mode="drop")
    ok = (jnp.max(t_b) <= BLOCK_WORDS * 32) & (total <= nwords * 32)
    return words, total, ok
