"""Experimental Pallas block packer vs the XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jpeg_tpu.entropy import encode_np, huffman
from jpeg_tpu.ops import bitpack, pack_pallas


def _random_blocks(rng, n, density=0.2):
    blocks = np.zeros((n, 64), dtype=np.int32)
    mask = rng.random((n, 64)) < density
    blocks[mask] = rng.integers(-200, 201, size=mask.sum())
    blocks[:, 0] = rng.integers(-800, 800, size=n)
    return blocks


@pytest.mark.parametrize("n,density", [(16, 0.0), (40, 0.15), (33, 0.3)])
def test_level1_matches_xla(rng, n, density):
    blocks = _random_blocks(rng, n, density)
    tbl = (rng.random(n) < 0.5).astype(np.int32)
    huff = huffman.standard_tables()
    luts = tuple(jnp.asarray(a) for a in bitpack.luts_from_tables(huff))

    buf, totals = pack_pallas.pack_level1_pallas(
        jnp.asarray(blocks), jnp.asarray(tbl), *luts, interpret=True
    )

    # Reference: XLA bitfields + an equivalent level-1 reduction.
    bits, nbits = bitpack.build_bitfields(jnp.asarray(blocks), jnp.asarray(tbl), *luts)
    nb = np.asarray(nbits)
    starts = np.cumsum(nb, axis=1) - nb
    t_ref = starts[:, -1] + nb[:, -1]
    np.testing.assert_array_equal(np.asarray(totals), t_ref)

    nwords = n * 8 + 2
    # pack_pallas.pack_level2 keeps the scatter formulation, so compare
    # against level2="segment_sum": for overflow streams (density 0.3 has
    # blocks past the 288-bit cap) the tree_or default legitimately differs
    # beyond the dropped range.
    w_ref, tot_ref, ok = bitpack.pack_bits(bits, nbits, nwords,
                                           level2="segment_sum")
    w_new, tot_new, ok2 = pack_pallas.pack_level2(buf, totals, nwords)
    assert int(tot_new) == int(tot_ref)
    np.testing.assert_array_equal(np.asarray(w_new), np.asarray(w_ref))


def test_full_scan_bytes_match_numpy(rng):
    # Sparse blocks stay under the 288-bit per-block device cap.
    blocks = np.zeros((48, 64), dtype=np.int32)
    mask = rng.random((48, 64)) < 0.06
    blocks[mask] = rng.integers(-60, 61, size=mask.sum())
    blocks[:, 0] = rng.integers(-300, 300, size=48)
    tbl = np.zeros(48, dtype=np.int32)
    huff = huffman.standard_tables()
    luts = tuple(jnp.asarray(a) for a in bitpack.luts_from_tables(huff))
    buf, totals = pack_pallas.pack_level1_pallas(
        jnp.asarray(blocks), jnp.asarray(tbl), *luts, interpret=True
    )
    assert int(np.asarray(totals).max()) <= 288
    words, total, ok = pack_pallas.pack_level2(buf, totals, 48 * 8 + 2)
    assert bool(ok)
    got = bitpack.finalize_segment(np.asarray(words), int(total)).tobytes()
    expect = encode_np.encode_scan(blocks, tbl, tbl, huff)
    assert got == expect


def test_encode_use_pallas_pack_byte_identical(rng):
    """encode(device_pack=True, use_pallas_pack=True) must produce the same
    JFIF bytes as the XLA two-level device packer, with and without
    restart segments."""
    from jpeg_tpu.models.encoder import encode

    img = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
    for mode, r in (("444", 0), ("420", 4)):
        a = encode(img, quality=80, subsampling=mode, restart_interval=r,
                   device_pack=True)
        b = encode(img, quality=80, subsampling=mode, restart_interval=r,
                   device_pack=True, use_pallas_pack=True)
        assert a == b
