"""Entropy codec round-trip: vectorized encoder vs table-driven decoder.

This is the differential test the reference could never run (its pipeline hangs
before emitting a single bit — SURVEY.md component 10)."""

import numpy as np
import pytest

from jpeg_tpu.entropy import decode_np, encode_np, huffman


def _random_blocks(rng, n, density=0.2, amp=200):
    blocks = np.zeros((n, 64), dtype=np.int64)
    mask = rng.random((n, 64)) < density
    blocks[mask] = rng.integers(-amp, amp + 1, size=mask.sum())
    return blocks


def _roundtrip(blocks, tbls, rng, restart=0, bpm=1, mcu_layout=None):
    n = blocks.shape[0]
    if mcu_layout is None:
        mcu_layout = [(0, 1, 0, 0)]
    # DPCM the DC channel the way the scan expects.
    enc = blocks.copy()
    dc_tbl = np.zeros(n, dtype=np.int64)
    ac_tbl = np.zeros(n, dtype=np.int64)
    prev = 0
    r_blocks = restart * bpm
    for i in range(n):
        if r_blocks and i % r_blocks == 0:
            prev = 0
        enc[i, 0] = blocks[i, 0] - prev
        prev = blocks[i, 0]
    scan = encode_np.encode_scan(
        enc, dc_tbl, ac_tbl, tbls, restart_interval=restart, blocks_per_mcu=bpm
    )
    luts = {k: decode_np.make_decode_lut(t) for k, t in tbls.items()}
    n_mcu = n // bpm
    out = decode_np.decode_scan(scan, n_mcu, [(0, bpm, 0, 0)], luts, restart)[0]
    return out


def test_roundtrip_basic(rng):
    blocks = _random_blocks(rng, 40)
    blocks[:, 0] = rng.integers(-500, 500, size=40)
    tbls = huffman.standard_tables()
    out = _roundtrip(blocks, tbls, rng)
    np.testing.assert_array_equal(out, blocks)


def test_roundtrip_restart_intervals(rng):
    blocks = _random_blocks(rng, 60)
    blocks[:, 0] = rng.integers(-500, 500, size=60)
    tbls = huffman.standard_tables()
    for restart in (1, 3, 7, 60, 100):
        out = _roundtrip(blocks, tbls, rng, restart=restart)
        np.testing.assert_array_equal(out, blocks)


def test_roundtrip_multiblock_mcu(rng):
    blocks = _random_blocks(rng, 48)
    blocks[:, 0] = rng.integers(-200, 200, size=48)
    tbls = huffman.standard_tables()
    out = _roundtrip(blocks, tbls, rng, restart=2, bpm=4)
    np.testing.assert_array_equal(out, blocks)


def test_roundtrip_extreme_values(rng):
    """Max-amplitude coefficients and long zero runs (ZRL chains)."""
    blocks = np.zeros((8, 64), dtype=np.int64)
    blocks[0, 0] = 1024  # extreme DC values; successive diff -2047 (max class 11)
    blocks[1, 0] = -1023
    blocks[2, 63] = 1  # 62 zeros -> 3 ZRLs + (14, size) symbol
    blocks[3, 1] = 1023  # max AC magnitude
    blocks[3, 62] = -1023
    blocks[4, 17] = -1
    blocks[5] = 1  # fully dense block (no EOB)
    tbls = huffman.standard_tables()
    out = _roundtrip(blocks, tbls, rng)
    np.testing.assert_array_equal(out, blocks)


def test_roundtrip_all_zero(rng):
    blocks = np.zeros((16, 64), dtype=np.int64)
    tbls = huffman.standard_tables()
    out = _roundtrip(blocks, tbls, rng, restart=4)
    np.testing.assert_array_equal(out, blocks)


def test_roundtrip_optimized_tables(rng):
    blocks = _random_blocks(rng, 64, density=0.15)
    blocks[:, 0] = rng.integers(-300, 300, size=64)
    enc = blocks.copy()
    enc[1:, 0] = blocks[1:, 0] - blocks[:-1, 0]
    tbl = np.zeros(64, dtype=np.int64)
    rec = encode_np.build_records(enc, tbl, tbl)
    freqs = encode_np.count_frequencies(rec)
    tbls = {k: huffman.optimal_table(v) for k, v in freqs.items()}
    scan = encode_np.encode_scan(enc, tbl, tbl, tbls, records=rec)
    luts = {k: decode_np.make_decode_lut(t) for k, t in tbls.items()}
    out = decode_np.decode_scan(scan, 64, [(0, 1, 0, 0)], luts, 0)[0]
    np.testing.assert_array_equal(out, blocks)


def test_stuffing():
    raw = np.array([0x12, 0xFF, 0x00, 0xFF, 0xFF, 0x34], dtype=np.uint8)
    stuffed = encode_np._stuff_bytes(raw)
    np.testing.assert_array_equal(
        stuffed, [0x12, 0xFF, 0x00, 0x00, 0xFF, 0x00, 0xFF, 0x00, 0x34]
    )
    np.testing.assert_array_equal(decode_np.unstuff(stuffed.tobytes()), raw)


def test_pack_bits_alignment():
    # Three records: 5 bits 10101, 11 bits all-ones, 3 bits 010.
    codes = np.array([0b10101, 0b11111111111, 0b010], dtype=np.int64)
    nbits = np.array([5, 11, 3], dtype=np.int64)
    out = encode_np._pack_bits(codes, nbits)
    # Stream: 10101 | 11111111111 | 010 | 1-padding
    np.testing.assert_array_equal(out, [0b10101111, 0b11111111, 0b01011111])


def test_bit_size():
    v = np.array([0, 1, -1, 2, 3, -4, 255, -256, 1023, -2047])
    np.testing.assert_array_equal(
        encode_np.bit_size(v), [0, 1, 1, 2, 2, 3, 8, 9, 10, 11]
    )
