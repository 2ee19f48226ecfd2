"""DCT/IDCT correctness, including the reference's golden vector.

The 8x8 test block is the well-known ITU/Wikipedia JPEG example the reference
verifies against in `test_dct` (src/jpg_driver.c:54-150, comment at :59); its
DCT DC coefficient is -415.375 and the q=50 quantized DC is -26 (verified
against the compiled reference — SURVEY.md §3.2).
"""

import numpy as np
import pytest
import scipy.fft

from jpeg_tpu.ops import dct, quant, tile, zigzag
from jpeg_tpu import tables

# Luma sample block from the JPEG Wikipedia article / ITU example (public data).
GOLDEN = np.array(
    [
        [52, 55, 61, 66, 70, 61, 64, 73],
        [63, 59, 55, 90, 109, 85, 69, 72],
        [62, 59, 68, 113, 144, 104, 66, 73],
        [63, 58, 71, 122, 154, 106, 70, 69],
        [67, 61, 68, 104, 126, 88, 68, 70],
        [79, 65, 60, 70, 77, 68, 58, 75],
        [85, 71, 64, 59, 55, 61, 65, 83],
        [87, 79, 69, 68, 65, 76, 78, 94],
    ],
    dtype=np.float64,
)


def test_basis_orthonormal():
    d = dct.dct_basis().astype(np.float64)
    np.testing.assert_allclose(d @ d.T, np.eye(8), atol=1e-6)


def test_golden_block_dc():
    shifted = GOLDEN - 128.0
    coeffs = np.asarray(dct.fdct_blocks(shifted[None])[0])
    assert abs(coeffs[0, 0] - (-415.375)) < 1e-2
    # Full block against scipy's orthonormal DCT-II.
    ref = scipy.fft.dctn(shifted, norm="ortho")
    np.testing.assert_allclose(coeffs, ref, atol=1e-3)


def test_golden_block_quantized_dc():
    shifted = GOLDEN - 128.0
    coeffs = dct.fdct_blocks(shifted[None])
    q = np.asarray(quant.quantize(coeffs, tables.QUANT_LUMA))[0]
    assert q[0, 0] == -26
    zz = np.asarray(zigzag.to_zigzag(q[None]))[0]
    assert zz[0] == -26


def test_fdct_matches_scipy_random(rng):
    blocks = rng.uniform(-128, 127, size=(32, 8, 8))
    ours = np.asarray(dct.fdct_blocks(blocks))
    ref = scipy.fft.dctn(blocks, axes=(1, 2), norm="ortho")
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_idct_inverts_fdct(rng):
    blocks = rng.uniform(-128, 127, size=(16, 8, 8)).astype(np.float32)
    rt = np.asarray(dct.idct_blocks(dct.fdct_blocks(blocks)))
    np.testing.assert_allclose(rt, blocks, atol=1e-3)


def test_plane_layout_matches_blocks(rng):
    plane = rng.uniform(-128, 127, size=(32, 48)).astype(np.float32)
    via_plane = np.asarray(dct.fdct_plane(plane))
    via_blocks = np.asarray(
        tile.unblockify(dct.fdct_blocks(tile.blockify(plane)))
    )
    np.testing.assert_allclose(via_plane, via_blocks, atol=1e-3)


def test_idct_plane_inverts(rng):
    plane = rng.uniform(-128, 127, size=(24, 40)).astype(np.float32)
    rt = np.asarray(dct.idct_plane(dct.fdct_plane(plane)))
    np.testing.assert_allclose(rt, plane, atol=1e-3)
