"""Experimental Pallas kernel: coefficient blocks -> packed per-block word
buffers, fully fused in VMEM (roadmap item 1 in docs/DESIGN.md §6).

The XLA two-level packer (ops/bitpack.py) materializes ~500 MB of intermediate
field arrays in HBM for a 4K image; this kernel keeps everything — magnitude
classes, Huffman lookups (as one-hot MXU dots), ZRL channel split, within-block
prefix sums and the one-hot word reduction — inside VMEM, emitting only the
(B, BLOCK_WORDS) buffers and per-block bit totals. Level 2 (global offsets +
~11 scatter updates per block) stays in XLA where it is already cheap.

Status: semantics validated against ops/bitpack in interpret mode (tests).
Real-hardware Mosaic compilation was attempted in round 2 and again in round 3
and OOM-kills the remote compile helper (SIGKILL) even in isolation — the
(TILE, 63, 1024) one-hot intermediates blow up Mosaic's compile-time memory
even at TILE=8 (see docs/DESIGN.md §6 for the measured detail). The round-2
fix went into the XLA packer instead (one-hot MXU lookups), which production
paths use; this module stays an opt-in appendix (`use_pallas_pack=True`,
correct via interpret-mode tests) until a Mosaic release can compile it.
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


def _kernel(blocks_ref, tbl_ref, codes_ref, lens_ref, buf_ref, total_ref,
            *, tile: int):
    v = blocks_ref[:]  # (tile, 64) int32
    tbl = tbl_ref[:]  # (tile, 1) int32
    codes = codes_ref[:]  # (1024, 1) f32: [dc0, dc1, ac0, ac1] x 256
    lens = lens_ref[:]

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

    # Huffman lookups as one-hot MXU dots against the merged (1024,) tables:
    # flat symbol index = class_base + tbl*256 + symbol.
    def lut(flat_sym):  # (tile, n) int32 -> (code i32, len i32)
        # HIGHEST: codes span 16 bits; default bf16 MXU passes are exact only
        # to 2^8 and would silently corrupt codes on hardware.
        oh = jax.nn.one_hot(flat_sym, 1024, dtype=jnp.float32)  # (tile, n, 1024)
        c = jax.lax.dot_general(
            oh, codes[:, 0],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        l = jax.lax.dot_general(
            oh, lens[:, 0],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return c.astype(jnp.int32), l.astype(jnp.int32)

    # DC records.
    dsize = size[:, :1]
    dc_code, dc_len = lut(tbl + dsize)  # dc class base 0, tables at 0/256
    dbits = (dc_code << dsize) | amp[:, :1]
    dnbits = dc_len + dsize

    # AC (run, size) records.
    sym = ((run & 15) << 4) | size
    ac_base = 512 + tbl  # (tile, 1): 512 + tbl*256... tbl is id*256 already
    ac_code, ac_len = lut(ac_base + jnp.where(nz, sym, 0)[:, 1:])
    ac_code = jnp.where(nz[:, 1:], ac_code, 0)
    ac_len = jnp.where(nz[:, 1:], ac_len, 0)
    cbits = (ac_code << size[:, 1:]) | jnp.where(nz[:, 1:], amp[:, 1:], 0)
    cn = ac_len + jnp.where(nz[:, 1:], size[:, 1:], 0)

    # ZRL channels.
    zrl_code, zrl_len = lut(ac_base + 0xF0)  # (tile, 1)
    kz = jnp.where(nz, run >> 4, 0)[:, 1:]
    pair = (zrl_code << zrl_len) | zrl_code
    n0 = jnp.minimum(kz, 2) * zrl_len
    b0 = jnp.where(kz >= 2, pair, jnp.where(kz == 1, zrl_code, 0))
    n1 = jnp.maximum(kz - 2, 0) * zrl_len
    b1 = jnp.where(kz >= 3, zrl_code, 0)

    # EOB.
    eob_code, eob_len = lut(ac_base)  # symbol 0
    has_eob = last_nz < 63
    ebits = jnp.where(has_eob, eob_code, 0)
    enbits = jnp.where(has_eob, eob_len, 0)

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

    # Merge the four tables into one (1024,) f32 array (values <= 2^16 are
    # exact in f32): [dc tbl0 | dc tbl1 | ac tbl0 | ac tbl1].
    codes = jnp.concatenate(
        [dc_code.astype(jnp.float32).reshape(512),
         ac_code.astype(jnp.float32).reshape(512)]
    )[:, None]
    lens = jnp.concatenate(
        [dc_len.astype(jnp.float32).reshape(512),
         ac_len.astype(jnp.float32).reshape(512)]
    )[:, None]

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
            pl.BlockSpec((1024, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1024, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, BLOCK_WORDS + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        blocks.astype(jnp.int32),
        (tbl.astype(jnp.int32) * 256)[:, None],
        codes,
        lens,
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
