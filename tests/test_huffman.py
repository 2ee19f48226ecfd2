"""Huffman table machinery tests: canonical codes, decode LUTs, and the
Annex-K.2 optimal construction the reference hangs in (huffman.c:172-179)."""

import numpy as np
import pytest

from jpeg_tpu import tables
from jpeg_tpu.entropy import decode_np, huffman


def test_dc_luma_canonical_codes():
    t = huffman.build_table(tables.DC_LUMA_BITS, tables.DC_LUMA_VALS)
    # BITS = [0,1,5,...]: symbol 0 -> the single 2-bit code 00;
    # symbols 1..5 -> 3-bit codes 010..110; symbol 6 -> 4-bit 1110, etc.
    assert t.size[0] == 2 and t.code[0] == 0b00
    assert t.size[1] == 3 and t.code[1] == 0b010
    assert t.size[5] == 3 and t.code[5] == 0b110
    assert t.size[6] == 4 and t.code[6] == 0b1110
    assert t.size[11] == 9 and t.code[11] == 0b111111110


def test_all_standard_tables_prefix_free():
    for t in huffman.standard_tables().values():
        codes = [(int(t.code[v]), int(t.size[v])) for v in t.vals]
        seen = set()
        for c, s in codes:
            assert 1 <= s <= 16
            bits = format(c, f"0{s}b")
            for other in seen:
                assert not bits.startswith(other) and not other.startswith(bits)
            seen.add(bits)


def test_decode_lut_roundtrip():
    for t in huffman.standard_tables().values():
        sym, ln = decode_np.make_decode_lut(t)
        for v in t.vals:
            s = int(t.size[v])
            window = int(t.code[v]) << (16 - s)
            assert sym[window] == v
            assert ln[window] == s
            # any suffix bits must not change the decode
            assert sym[window + (1 << (16 - s)) - 1] == v


def _check_legal(t: huffman.HuffTable, freq):
    # Kraft sum of a legal prefix code <= 1; lengths in [1, 16].
    ls = t.size[t.vals]
    assert (ls >= 1).all() and (ls <= 16).all()
    kraft = np.sum(2.0 ** (-ls.astype(np.float64)))
    assert kraft <= 1.0 + 1e-12
    # every symbol with nonzero frequency must have a code
    used = np.nonzero(np.asarray(freq) > 0)[0]
    assert set(used.tolist()) <= set(t.vals.tolist())
    # no all-ones code (reserved for the pseudo-symbol per K.2)
    for v in t.vals:
        s = int(t.size[v])
        assert int(t.code[v]) != (1 << s) - 1 or s == 16


def test_optimal_table_random(rng):
    freq = rng.integers(0, 10000, size=256)
    t = huffman.optimal_table(freq)
    _check_legal(t, freq)
    # Optimal static code must not beat entropy, nor be much worse.
    p = freq / freq.sum()
    ent = -np.sum(p[p > 0] * np.log2(p[p > 0]))
    avg = np.sum(freq * t.size[np.arange(256)]) / freq.sum()
    assert ent <= avg <= ent + 1.5


def test_optimal_table_skewed(rng):
    freq = np.zeros(256, dtype=np.int64)
    freq[0] = 1_000_000
    freq[1] = 1
    freq[77] = 3
    t = huffman.optimal_table(freq)
    _check_legal(t, freq)
    assert t.size[0] <= t.size[1]


def test_optimal_table_single_symbol():
    freq = np.zeros(256, dtype=np.int64)
    freq[42] = 5
    t = huffman.optimal_table(freq)
    _check_legal(t, freq)
    assert t.size[42] == 1


def test_optimal_table_empty():
    t = huffman.optimal_table(np.zeros(256, dtype=np.int64))
    assert len(t.vals) == 0


def test_optimal_beats_standard_on_real_stream(rng):
    """Optimized tables must produce a smaller scan than Annex K.3 typical ones."""
    from jpeg_tpu.entropy import encode_np

    blocks = np.zeros((64, 64), dtype=np.int64)
    blocks[:, 0] = rng.integers(-30, 30, size=64)
    blocks[:, 1] = rng.integers(-5, 5, size=64)
    blocks[:, 7] = rng.integers(-2, 2, size=64)
    tbl = np.zeros(64, dtype=np.int64)
    rec = encode_np.build_records(blocks, tbl, tbl)
    freqs = encode_np.count_frequencies(rec)
    opt = {k: huffman.optimal_table(v) for k, v in freqs.items()}
    std = huffman.standard_tables()
    s_opt = encode_np.encode_scan(blocks, tbl, tbl, opt, records=rec)
    s_std = encode_np.encode_scan(blocks, tbl, tbl, std, records=rec)
    assert len(s_opt) <= len(s_std)
