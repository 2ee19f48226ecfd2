"""Bit-identity of the round-5 split/fixed-id level-1 variants.

The encoder's MCU interleave has a STATIC per-MCU table-id pattern
([0]*hv + [1, 1]), so level 1 can slice Y/C into contiguous fixed-id arrays
and halve the Huffman-lookup one-hot width (bitpack._level1_channels_split).
These tests pin every variant — split bf16, split int8 planes, fixed-tid —
byte-identical to the mixed-id r4 formulation, which the suite elsewhere
pins byte-identical to the host packers and PIL.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from jpeg_tpu.entropy import huffman
from jpeg_tpu.ops import bitpack


def _luts():
    return tuple(
        jnp.asarray(a)
        for a in bitpack.luts_from_tables(huffman.standard_tables())
    )


def _blocks(hv: int, nm: int, seed: int = 0, density: float = 0.25,
            lo: int = -1023, hi: int = 1024):
    rng = np.random.default_rng(seed)
    b = nm * (hv + 2)
    blocks = np.zeros((b, 64), np.int32)
    mask = rng.random((b, 64)) < density
    blocks[mask] = rng.integers(lo, hi, mask.sum())
    # Edge cases: all-zero block, position-63 nonzero (no EOB), DC-only
    # with the max diff, single long runs (1 and 3 ZRLs).
    blocks[0] = 0
    blocks[1] = 0
    blocks[1, 63] = 5
    blocks[2, 1:] = 0
    blocks[2, 0] = -2047
    blocks[3] = 0
    blocks[3, 17] = 1
    blocks[4] = 0
    blocks[4, 50] = 1
    tbl = np.tile(
        np.r_[np.zeros(hv, np.int32), np.ones(2, np.int32)], nm)
    return jnp.asarray(blocks), jnp.asarray(tbl)


@pytest.mark.parametrize("hv", [1, 2, 4])
@pytest.mark.parametrize("lookup", ["bf16", "int8"])
def test_level1_split_bit_identical(hv, lookup):
    blocks, tbl = _blocks(hv, nm=40)
    luts = _luts()
    bw = 12
    buf0, t0 = bitpack._level1_channels(blocks, tbl, *luts, bw)
    buf1, t1 = bitpack._level1_channels_split(blocks, hv, *luts, bw, lookup)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(buf0), np.asarray(buf1))


@pytest.mark.parametrize("lookup", ["bf16", "int8"])
def test_pack_blocks_tree_split_words_identical(lookup):
    hv, nm = 4, 40
    bpm = hv + 2
    blocks, tbl = _blocks(hv, nm, seed=7)
    luts = _luts()
    nwords = nm * bpm * 12 + 2
    w0, t0, ok0 = bitpack.pack_blocks_tree(
        blocks, tbl, *luts, nwords, bpm, 12, bpm * 6)
    w1, t1, ok1 = bitpack.pack_blocks_tree(
        blocks, tbl, *luts, nwords, bpm, 12, bpm * 6,
        split_hv=hv, lookup=lookup)
    assert int(t0) == int(t1) and bool(ok0) == bool(ok1)
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))


def test_fixed_tid_matches_mixed():
    # All-luma (the grayscale path) and all-chroma streams.
    blocks, _ = _blocks(2, nm=30, seed=3)
    luts = _luts()
    for tid in (0, 1):
        tbl = jnp.full((blocks.shape[0],), tid, jnp.int32)
        buf0, t0 = bitpack._level1_channels(blocks, tbl, *luts, 12)
        buf1, t1 = bitpack._level1_channels_fixed(blocks, tid, *luts, 12)
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(buf0), np.asarray(buf1))


def test_dense_content_totals():
    # q95-style dense blocks: every position nonzero, larger magnitudes —
    # exercises the exactness bound of the plane dots (sums of 16 terms
    # each <= 2^8/2^7 per plane).
    blocks, tbl = _blocks(2, nm=30, seed=11, density=0.95, lo=-255, hi=256)
    luts = _luts()
    buf0, t0 = bitpack._level1_channels(blocks, tbl, *luts, 24)
    for lookup in ("bf16", "int8"):
        buf1, t1 = bitpack._level1_channels_split(
            blocks, 2, *luts, 24, lookup)
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(buf0), np.asarray(buf1))
