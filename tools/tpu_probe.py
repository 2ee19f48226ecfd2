"""Real-TPU probe harness: one parameterized tool, subcommand per question.

Round-4 consolidation of the tpu_probe{,2-7i}.py series (VERDICT r3 item
10) — the findings those one-off scripts established are recorded in
docs/DESIGN.md §6; the durable measurement capabilities live here. Every
compile lands in .jax_cache, so probing also pre-warms bench.py.

Usage (ALWAYS under timeout — the tunnel can wedge for minutes):

  timeout 1800 python tools/tpu_probe.py <subcommand> [...]

Subcommands:
  alive      tunnel health: one tiny device op, timed
  dispatch   per-dispatch floor (trivial program, pipelined)
  transfer   h2d / d2h MB/s for a 24 MB buffer
  transform  A/B: exact int conv vs f32 HIGHEST conv vs staged (4K 4:2:0)
  pack       A/B: level-2 tree_or vs segment_sum; tree/block grouping
  encode     full packed program: single, batched x4, q95 scale-2 row,
             and the TPU batched==single BYTE IDENTITY check (int transform)
  decode     sparse fused decode: single, pipelined x8, batched x4
  all        transform + pack + encode + decode

Pipelined xN timing cancels the ~22-45 ms dispatch floor; sync is a 1-element
pull (axon's block_until_ready does not block)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def _pipe(f, n=16, reps=2):
    """Best pipelined per-call seconds over `reps` rounds of n calls.

    n=16 matters: the tunnel's dispatch-stream overhead amortizes as ~38/n
    ms/call (measured r4: a trivial program costs 9.6 ms/call at n=4 but
    0.69 at n=64), so shallow pipelines hide up to ~8 ms of floor inside
    every 'stage' number."""
    _sync(f())  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = f()
        _sync(out)
        best = min(best, (time.time() - t0) / n)
    return best


def _setup_4k():
    import jax.numpy as jnp
    from bench import make_image
    from jpeg_tpu.config import Subsampling
    from jpeg_tpu.entropy import huffman
    from jpeg_tpu.ops import bitpack, quant

    img = make_image(2160, 3840)
    mode = Subsampling.YUV420
    import jax

    dev = jax.device_put(jnp.asarray(img))
    qy = jnp.asarray(quant.luma_table(75))
    qc = jnp.asarray(quant.chroma_table(75))
    luts = tuple(jnp.asarray(a) for a in bitpack.luts_from_tables(
        huffman.standard_tables()))
    return img, dev, qy, qc, luts, mode


def cmd_alive():
    import jax

    t0 = time.time()
    x = jax.device_put(np.arange(8, dtype=np.int32))
    y = np.asarray(x + 1)
    print(f"tunnel OK {y[:3]} {time.time()-t0:.1f}s {jax.devices()}")


def cmd_dispatch():
    import jax, jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jax.device_put(jnp.zeros(8, jnp.int32))
    _sync(f(x))
    for n in (1, 8):
        t = _pipe(lambda: f(x), n=n)
        print(f"dispatch floor (pipelined x{n}): {t*1e3:.1f} ms/call")


def cmd_transfer():
    import jax

    buf = np.random.default_rng(0).integers(
        0, 255, (2160, 3840, 3), dtype=np.uint8)
    t0 = time.time()
    d = jax.device_put(buf)
    _sync(d)
    up = time.time() - t0
    print(f"h2d 24.9 MB: {up*1e3:.0f} ms = {buf.nbytes/up/1e6:.1f} MB/s")
    t0 = time.time()
    np.asarray(d)
    dn = time.time() - t0
    print(f"d2h 24.9 MB: {dn*1e3:.0f} ms = {buf.nbytes/dn/1e6:.1f} MB/s")


def cmd_transform():
    import jax
    from jpeg_tpu.ops import mcu_conv

    _, dev, qy, qc, _, mode = _setup_4k()
    variants = {
        "int exact (bf16 hi/lo conv)": mcu_conv._mcu_transform_int,
        "f32 HIGHEST conv (r3)": mcu_conv._mcu_transform_conv_f32,
    }
    for name, fn in variants.items():
        j = jax.jit(lambda x, a, b, f=fn: f(x, a, b, mode))
        t = _pipe(lambda: j(dev, qy, qc))
        print(f"transform 4K {name}: {t*1e3:.1f} ms")
    # exactness: int path vs int64 host emulation on a small tile
    from tests.test_int_transform import _int_transform_numpy

    small = np.asarray(dev[:64, :64])
    got = np.asarray(jax.jit(
        lambda x, a, b: mcu_conv._mcu_transform_int(x, a, b, mode)
    )(small, qy, qc))
    want = _int_transform_numpy(small, np.asarray(qy), np.asarray(qc), mode)
    same = np.array_equal(got, want)
    print(f"int transform exactness vs int64 host: {'OK' if same else 'FAIL'}")


def cmd_pack():
    import jax
    from jpeg_tpu.models import encoder as E
    from jpeg_tpu.ops import bitpack

    _, dev, qy, qc, luts, mode = _setup_4k()

    # A/B the full packed program with each level-2 formulation via a
    # one-off jit (group/level2 are trace-time constants).
    def packed(level2):
        def f(rgb, qy, qc, *l):
            bl, tb, nm, hv = E._interleaved_blocks(rgb, qy, qc, mode, 0)
            bits, nbits = bitpack.build_bitfields(bl, tb, *l)
            nwords = bl.shape[0] * E.WORDS_PER_BLOCK + 2
            return bitpack.pack_bits_tree(bits, nbits, nwords, hv + 2,
                                          level2=level2)
        return jax.jit(f)

    for lvl in ("tree_or", "segment_sum"):
        j = packed(lvl)
        t = _pipe(lambda: j(dev, qy, qc, *luts))
        print(f"packed program (tree grouping, level2={lvl}): {t*1e3:.1f} ms")


def cmd_encode():
    import jax, jax.numpy as jnp
    from jpeg_tpu.models import encoder as E
    from jpeg_tpu.ops import quant

    _, dev, qy, qc, luts, mode = _setup_4k()
    fn = E._jit_color_packed(mode, 0)
    t = _pipe(lambda: fn(dev, qy, qc, *luts))
    out = fn(dev, qy, qc, *luts)
    ok = bool(np.asarray(out[2]).all())
    print(f"packed encode program: {t*1e3:.1f} ms (ok={ok}, "
          f"{8.29/t:.0f} MPix/s)")

    KB = 4
    fnb = E._jit_color_packed_batch(mode, 0)
    batch = jnp.broadcast_to(dev, (KB, *dev.shape))
    tb = _pipe(lambda: fnb(batch, qy, qc, *luts), n=2)
    print(f"batched x{KB} packed program: {tb/KB*1e3:.1f} ms/img "
          f"({8.29*KB/tb:.0f} MPix/s)")

    # TPU cross-executable byte identity (the int-transform guarantee).
    wb, tbt, okb = fnb(batch, qy, qc, *luts)
    ws, ts, oks = fn(dev, qy, qc, *luts)
    ident = (int(np.asarray(tbt)[0, 0]) == int(np.asarray(ts)[0])
             and np.array_equal(np.asarray(wb[0]), np.asarray(ws)))
    print(f"TPU batched == single bytes: {'OK' if ident else 'FAIL'}")

    qy95 = jnp.asarray(quant.luma_table(95))
    qc95 = jnp.asarray(quant.chroma_table(95))
    fn95 = E._jit_color_packed(mode, 0, False, "block", 2)
    t95 = _pipe(lambda: fn95(dev, qy95, qc95, *luts))
    ok95 = bool(np.asarray(fn95(dev, qy95, qc95, *luts)[2]).all())
    print(f"q95 scale-2 packed program: {t95*1e3:.1f} ms (ok={ok95})")


def cmd_pack5():
    """Round-5 A/B: level-1 field-build variants inside the full packed
    program — mixed-id (r4 default) vs static Y/C split 16-wide (bf16
    planes) vs split int8 planes. All three must report identical totals
    (bit-identity is pinned on CPU by tests/test_bitpack_split.py)."""
    import jax
    from jpeg_tpu.models import encoder as E
    from jpeg_tpu.ops import bitpack

    img, dev, qy, qc, luts, mode = _setup_4k()

    def program(variant):
        def f(rgb, qy, qc, *l):
            bl, tb, n_mcu, hv = E._interleaved_blocks(rgb, qy, qc, mode, 0)
            bpm = hv + 2
            nwords = n_mcu * bpm * E.WORDS_PER_BLOCK + 2
            kw = {}
            if variant == "split":
                kw = dict(split_hv=hv)
            elif variant == "int8":
                kw = dict(split_hv=hv, lookup="int8")
            return bitpack.pack_blocks_tree(bl, tb, *l, nwords, bpm, **kw)
        return jax.jit(f)

    totals = {}
    for variant in ("mixed", "split", "int8"):
        j = program(variant)
        t = _pipe(lambda: j(dev, qy, qc, *luts))
        w, tot, ok = j(dev, qy, qc, *luts)
        totals[variant] = int(np.asarray(tot))
        print(f"packed program (level1={variant}): {t*1e3:.1f} ms "
              f"(ok={bool(np.asarray(ok))}, total_bits={totals[variant]})")
    assert len(set(totals.values())) == 1, f"variant totals differ: {totals}"


def cmd_pack5b():
    """Round-5 level-1 attribution within the SPLIT formulation: transform
    alone, split level 1 alone (bf16 vs stacked-RHS), full pack from
    blocks, and the KB=12 batched program."""
    import jax
    from jpeg_tpu.models import encoder as E
    from jpeg_tpu.ops import bitpack

    img, dev, qy, qc, luts, mode = _setup_4k()
    hv = mode.h_factor * mode.v_factor
    bpm = hv + 2

    jb = jax.jit(lambda rgb, qy, qc: E._interleaved_blocks(
        rgb, qy, qc, mode, 0)[0])
    t = _pipe(lambda: jb(dev, qy, qc))
    print(f"transform+interleave alone: {t*1e3:.1f} ms")
    blocks = jb(dev, qy, qc)
    _sync(blocks)

    for lk in ("bf16", "stack", "tree"):
        j1 = jax.jit(lambda bl, *l: bitpack._level1_channels_split(
            bl, hv, *l, bitpack.BLOCK_WORDS, lk))
        t = _pipe(lambda: j1(blocks, *luts))
        print(f"split level 1 alone ({lk}): {t*1e3:.1f} ms")

    nblocks = int(blocks.shape[0])
    nwords = nblocks * E.WORDS_PER_BLOCK + 2
    tb = jax.numpy.zeros((nblocks,), jax.numpy.int32)
    jp = jax.jit(lambda bl, *l: bitpack.pack_blocks_tree(
        bl, tb, *l, nwords, bpm, split_hv=hv))
    t = _pipe(lambda: jp(blocks, *luts))
    print(f"full pack from blocks (split): {t*1e3:.1f} ms")

    for KB in (8, 12):
        try:
            fnb = E._jit_color_packed_batch(mode, 0)
            batch = jax.numpy.broadcast_to(dev, (KB, *dev.shape))
            t = _pipe(lambda: fnb(batch, qy, qc, *luts), n=4)
            print(f"batched x{KB} packed program: {t/KB*1e3:.1f} ms/img "
                  f"({8.29/(t/KB):.0f} MPix/s)")
        except Exception as e:
            print(f"batched x{KB} failed: {type(e).__name__}: {e}")


def cmd_stream5():
    """encode_stream standard vs optimize_tables sustained rate (VERDICT r4
    item 9): the optimized mode adds one histogram program per image on a
    shared upload; on an upload-bound link the sustained delta should be
    small while the bytes shrink."""
    import numpy as np
    from bench import make_image
    from jpeg_tpu.parallel.pipeline import encode_stream

    img = make_image(2160, 3840)
    N = 8

    def imgs():
        for i in range(N):
            yield np.roll(img, 29 * i, axis=0)

    for label, kw in (("standard", {}), ("optimize_tables",
                                        {"optimize_tables": True})):
        list(encode_stream([img], quality=75, subsampling="420", **kw))
        t0 = time.time()
        outs = list(encode_stream(imgs(), quality=75, subsampling="420",
                                  **kw))
        el = time.time() - t0
        mb = sum(len(o) for o in outs) / 1e6
        print(f"encode_stream {label}: {N * 8.2944 / el:.1f} MPix/s "
              f"sustained, {mb:.2f} MB total")


def _setup_decode_4k():
    """Parse a 4K q75 420 stream the way decoder.decode's sparse path does,
    returning everything the stage programs need."""
    import jax.numpy as jnp
    from bench import make_image
    from jpeg_tpu import encode
    from jpeg_tpu.entropy import decode_device
    from jpeg_tpu.io import jfif
    from jpeg_tpu.models import layout

    img = make_image(2160, 3840)
    jpg = encode(img, quality=75, subsampling="420")
    info = jfif.parse_jpeg(jpg)
    comps = info.components
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcu_rows = layout.ceil_div(info.height, 8 * vmax)
    mcu_cols = layout.ceil_div(info.width, 8 * hmax)
    n_mcu = mcu_rows * mcu_cols
    mcu_layout = [(i, c.h * c.v, c.dc_id, c.ac_id) for i, c in enumerate(comps)]
    payload, B, Sp, Ep, Edp = decode_device.sparse_payload(
        info.scan_data, n_mcu, mcu_layout, info.htables,
        info.restart_interval)
    ranges, geo, base = [], [], 0
    for c in comps:
        bpm = c.h * c.v
        ranges.append((base, base + bpm * n_mcu))
        geo.append((mcu_rows, mcu_cols, c.v, c.h) if bpm > 1 else None)
        base += bpm * n_mcu
    shapes = tuple((mcu_rows * c.v, mcu_cols * c.h) for c in comps)
    factors = tuple((hmax // c.h, vmax // c.v) for c in comps)
    qtabs = [jnp.asarray(info.qtables[c.qtab_id]) for c in comps]
    return (jpg, payload, B, Sp, Ep, Edp, tuple(ranges), tuple(geo),
            shapes, factors, qtabs)


def cmd_decode_stages():
    """Stage attribution for the 15.9 ms fused sparse decode program
    (VERDICT r4 item 2): cumulative sub-programs — densify | +reorder |
    +dequant/IDCT planes | full finish — each returning a scalar so the
    output transfer never skews a stage. Stage cost = adjacent diff (each
    sub-program is its own XLA fusion world, so diffs are indicative, not
    exact)."""
    import jax
    import jax.numpy as jnp
    from jpeg_tpu import tables
    from jpeg_tpu.entropy import decode_device
    from jpeg_tpu.models import layout
    from jpeg_tpu.ops import dct, tile

    (jpg, payload, B, Sp, Ep, Edp, ranges, geo, shapes, factors,
     qtabs) = _setup_decode_4k()
    pay = jax.device_put(jnp.asarray(payload))

    def p_densify(payload):
        rows = decode_device.densify_body(payload, B, Sp, Ep, Edp)
        return rows.sum()

    def p_reorder(payload):
        rows = decode_device.densify_body(payload, B, Sp, Ep, Edp)
        acc = jnp.int32(0)
        for (lo, hi), g in zip(ranges, geo):
            s = rows[lo:hi]
            if g is not None:
                s = layout.scan_to_raster(s, *g)
            acc += s.sum()
        return acc

    def p_idct(payload, *qt):
        rows = decode_device.densify_body(payload, B, Sp, Ep, Edp)
        acc = jnp.float32(0)
        for (lo, hi), g, q, (hb, wb) in zip(ranges, geo, qt, shapes):
            s = rows[lo:hi]
            if g is not None:
                s = layout.scan_to_raster(s, *g)
            qz = q.reshape(64)[jnp.asarray(tables.ZIGZAG_ORDER)].astype(
                jnp.float32)
            flat = dct.idct_zigzag_blocks(
                s.reshape(-1, 64).astype(jnp.float32) * qz)
            plane = tile.plane_from_scan_blocks(flat, hb, wb) + 128.0
            acc += jnp.clip(jnp.round(plane), 0.0, 255.0).sum()
        return acc

    names = ("densify", "+reorder", "+idct+round")
    progs = (p_densify, p_reorder, p_idct)
    prev = 0.0
    for name, p in zip(names, progs):
        j = jax.jit(p)
        args = (pay,) + tuple(qtabs) if p is p_idct else (pay,)
        t = _pipe(lambda: j(*args)) * 1e3
        print(f"{name}: {t:.1f} ms (stage ~{t - prev:.1f})")
        prev = t

    from jpeg_tpu import decode
    _sync(decode(jpg, entropy="sparse", device_output=True))
    t = _pipe(lambda: decode(jpg, entropy="sparse", device_output=True)) * 1e3
    print(f"full fused program (incl host walk+payload): {t:.1f} ms "
          f"(finish stage ~{t - prev:.1f} incl upsample+color)")


def cmd_decode():
    import jax
    from jpeg_tpu import decode, encode
    from jpeg_tpu.models.decoder import decode_batched

    img, *_ = _setup_4k()
    jpg = encode(img, quality=75, subsampling="420")
    _sync(decode(jpg, entropy="sparse", device_output=True))
    t0 = time.time()
    out = decode(jpg, entropy="sparse", device_output=True)
    _sync(out)
    print(f"sparse fused decode (single): {(time.time()-t0)*1e3:.1f} ms")

    from concurrent.futures import ThreadPoolExecutor

    KD = 8
    with ThreadPoolExecutor(2) as pool:
        t0 = time.time()
        outs = list(pool.map(
            lambda _: decode(jpg, entropy="sparse", device_output=True),
            range(KD)))
        _sync(outs[-1])
        t = (time.time() - t0) / KD
    print(f"sparse decode pipelined x{KD}: {t*1e3:.1f} ms/img "
          f"({8.29/t:.0f} MPix/s)")

    KB = 4
    datas = [jpg] * KB
    _sync(decode_batched(datas, device_output=True))
    t0 = time.time()
    o = decode_batched(datas, device_output=True)
    _sync(o)
    t = (time.time() - t0) / KB
    print(f"decode_batched x{KB}: {t*1e3:.1f} ms/img ({8.29/t:.0f} MPix/s)")


def main():
    cmds = {
        "alive": cmd_alive, "dispatch": cmd_dispatch,
        "transfer": cmd_transfer, "transform": cmd_transform,
        "pack": cmd_pack, "encode": cmd_encode, "decode": cmd_decode,
        "pack5": cmd_pack5, "pack5b": cmd_pack5b,
        "decode_stages": cmd_decode_stages, "stream5": cmd_stream5,
    }
    names = sys.argv[1:] or ["alive"]
    if names == ["all"]:
        names = ["transform", "pack", "encode", "decode"]
    for n in names:
        print(f"--- {n} ---", flush=True)
        try:
            cmds[n]()
        except Exception as e:
            print(f"{n} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
