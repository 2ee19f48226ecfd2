import ctypes, numpy as np, sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import jpeg_tpu.entropy.native as native
native._LIB_PATH = __import__('pathlib').Path('/tmp/libjt_asan.so')
native._tried = False; native._lib = None
import types
native._build = lambda: True
assert native.available()
from jpeg_tpu.entropy import encode_np, huffman, decode_np
rng = np.random.default_rng(7)
huff = huffman.standard_tables()
for trial in range(20):
    n = int(rng.integers(1, 80))
    blocks = np.zeros((n, 64), dtype=np.int64)
    mask = rng.random((n, 64)) < rng.uniform(0.05, 0.9)
    blocks[mask] = rng.integers(-1000, 1001, size=mask.sum())
    blocks[:, 0] = rng.integers(-2047, 2048, size=n)
    tbl = (rng.random(n) < 0.5).astype(np.int64)
    r = int(rng.integers(0, 9))
    a = encode_np.encode_scan(blocks, tbl, tbl, huff, restart_interval=r, blocks_per_mcu=1)
    b = native.encode_scan(blocks, tbl, huff, restart_interval=r, blocks_per_mcu=1)
    assert a == b, trial
    # decode it back (single component layout, table 0 only when tbl uniform)
    if tbl.max() == tbl.min():
        lay = [(0, 1, int(tbl[0]), int(tbl[0]))]
        out = native.decode_scan(a, n, lay, huff, r)
        luts = {k: decode_np.make_decode_lut(t) for k, t in huff.items()}
        ref = decode_np.decode_scan(a, n, lay, luts, r)
        np.testing.assert_array_equal(out[0], ref[0])
# corrupt-stream decodes (must error or return, never crash/overflow)
for trial in range(30):
    data = rng.integers(0, 256, size=int(rng.integers(1, 200))).astype(np.uint8).tobytes()
    try:
        native.decode_scan(data, 50, [(0, 1, 0, 0)], huff, int(rng.integers(0, 5)))
    except ValueError:
        pass
print("ASAN native fuzz: OK")
