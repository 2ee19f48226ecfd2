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
        # sparse walker differential: densified == the dense decoder
        vals, ks, counts, dc = native.sparse_scan(a, n, lay, huff, r)
        dense = np.zeros((n, 64), dtype=np.int32)
        dense[:, 0] = dc
        bid = np.repeat(np.arange(n), counts)
        dense[bid, ks.astype(np.int64)] = vals
        np.testing.assert_array_equal(dense, ref[0])
# corrupt-stream decodes (must error or return, never crash/overflow)
for trial in range(30):
    data = rng.integers(0, 256, size=int(rng.integers(1, 200))).astype(np.uint8).tobytes()
    try:
        native.decode_scan(data, 50, [(0, 1, 0, 0)], huff, int(rng.integers(0, 5)))
    except ValueError:
        pass
    try:
        native.sparse_scan(data, 50, [(0, 1, 0, 0)], huff,
                           int(rng.integers(0, 5)))
    except Exception:
        pass

# ---- progressive (SOF2) walker: differential + corruption under ASan ------
import io
from PIL import Image
from jpeg_tpu.io import jfif
from jpeg_tpu.entropy import progressive_np

yy, xx = np.mgrid[0:64, 0:80]
img = np.clip(
    np.stack([xx * 3, yy * 3, (xx + yy) * 2], -1)
    + rng.integers(-20, 21, (64, 80, 3)),
    0, 255,
).astype(np.uint8)
streams = []
for q, sub in [(30, 2), (75, 2), (95, 0)]:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", progressive=True, quality=q,
                              subsampling=sub)
    streams.append(buf.getvalue())
buf = io.BytesIO()
Image.fromarray(img).save(buf, "JPEG", progressive=True, quality=80,
                          restart_marker_rows=1)
streams.append(buf.getvalue())
for jpg in streams:
    info = jfif.parse_jpeg(jpg)
    g_nat = progressive_np.decode_progressive(info, backend="native")
    g_np = progressive_np.decode_progressive(info, backend="numpy")
    for a, b in zip(g_nat, g_np):
        np.testing.assert_array_equal(a, b)

# Mutated / truncated progressive scans: error or clean return, never a
# memory fault (ASan would abort the process).
base = streams[1]
for trial in range(60):
    b = bytearray(base)
    kind = trial % 3
    if kind == 0:  # flip random bytes in the tail (scan data region)
        for _ in range(int(rng.integers(1, 8))):
            i = int(rng.integers(len(b) // 2, len(b)))
            b[i] = int(rng.integers(0, 256))
    elif kind == 1:  # truncate
        b = b[: int(rng.integers(len(b) // 3, len(b)))]
    else:  # splice random garbage into the middle
        i = int(rng.integers(len(b) // 2, len(b)))
        b[i : i + 16] = rng.integers(0, 256, 16).astype(np.uint8).tobytes()
    try:
        info = jfif.parse_jpeg(bytes(b))
        if info.progressive:
            progressive_np.decode_progressive(info, backend="native")
    except (ValueError, jfif.JpegFormatError):
        pass
print("ASAN native fuzz: OK (incl. progressive)")

# ---- round-4 native additions: finalize_scan + pack_payload ---------------
from jpeg_tpu.entropy import decode_device
from jpeg_tpu.ops import bitpack as _bp

for trial in range(20):
    nseg = int(rng.integers(1, 9))
    W = int(rng.integers(1, 80))
    words = rng.integers(0, 1 << 32, (nseg, W), dtype=np.uint64).astype(np.uint32)
    words[rng.random((nseg, W)) < 0.3] |= np.uint32(0xFF000000)
    totals = rng.integers(1, W * 32 + 1, nseg)
    rb = int(rng.integers(0, 8))
    got = native.finalize_scan(words, totals, rb)
    parts = []
    for s in range(nseg):
        parts.append(_bp.finalize_segment(words[s], int(totals[s])).tobytes())
        if s != nseg - 1:
            parts.append(bytes([0xFF, 0xD0 + ((rb + s) & 7)]))
    assert got == b"".join(parts), f"finalize trial {trial}"

_orig_avail = native.available
for trial in range(20):
    B = int(rng.integers(1, 120))
    counts = rng.integers(0, 12, B).astype(np.uint8)
    S = int(counts.sum())
    ks = np.concatenate([
        np.sort(rng.choice(np.arange(1, 64), size=c, replace=False))
        for c in counts
    ]) if S else np.zeros(0, np.uint8)
    ks = ks.astype(np.uint8)
    vals = rng.integers(-1023, 1024, S).astype(np.int16)
    vals[vals == 0] = 1
    dc = rng.integers(-2047, 2048, B).astype(np.int32)
    Sp = decode_device.sparse_bucket(S)
    Ep = decode_device.exception_bucket(
        int(np.count_nonzero(np.abs(vals.astype(np.int32)) > 7)))
    Edp = decode_device.exception_bucket(decode_device.dc_diff_exceptions(dc))
    a = native.pack_payload(vals, ks, counts, dc, Sp, Ep, Edp)
    native.available = lambda: False
    try:
        b = decode_device.build_payload(vals, ks, counts, dc, Sp, Ep, Edp)
    finally:
        native.available = _orig_avail
    np.testing.assert_array_equal(a, b, err_msg=f"pack_payload trial {trial}")
    # undersized exception buckets must raise, not overflow
    if np.count_nonzero(np.abs(vals.astype(np.int32)) > 7) > 0:
        try:
            native.pack_payload(vals, ks, counts, dc, Sp, 0, Edp)
            raise AssertionError("expected ValueError for Ep=0")
        except ValueError:
            pass

print("asan fuzz ok (incl. finalize_scan + pack_payload)")
