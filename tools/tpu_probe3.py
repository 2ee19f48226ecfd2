"""Probe 3: microbench the ops inside build_bitfields (find the 268 ms), and
compile/measure the Pallas pack level-1 kernel in isolation (the combined
program OOM-killed the remote compiler; divide and conquer).

Usage: timeout 3000 python tools/tpu_probe3.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    from jpeg_tpu.entropy import huffman
    from jpeg_tpu.ops import bitpack, pack_pallas, symbols

    B = 194400  # 4K 4:2:0 block count
    rng = np.random.default_rng(0)
    # Realistic sparsity: ~6 nonzero ACs per block.
    blocks_np = np.zeros((B, 64), dtype=np.int32)
    blocks_np[:, 0] = rng.integers(-80, 80, B)
    for _ in range(6):
        pos = rng.integers(1, 64, B)
        blocks_np[np.arange(B), pos] = rng.integers(-40, 40, B)
    tbl_np = np.zeros(B, dtype=np.uint8)
    tbl_np[B // 2:] = 1
    htables = huffman.standard_tables()
    luts = tuple(jnp.asarray(a) for a in bitpack.luts_from_tables(htables))
    blocks = jax.device_put(jnp.asarray(blocks_np))
    tbl = jax.device_put(jnp.asarray(tbl_np))

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    def bench_step(name, fn, n=3):
        try:
            t0 = time.time()
            sync(fn())
            print(f"[{name}] warm/compile {time.time()-t0:.1f}s", flush=True)
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                sync(fn())
                best = min(best, time.time() - t0)
            print(f"[{name}] best {best*1e3:.1f} ms", flush=True)
            return best
        except Exception as e:
            msg = str(e).splitlines()[:4]
            print(f"[{name}] FAILED: {type(e).__name__}: " + " | ".join(msg),
                  flush=True)
            return None

    # --- microbenches of build_bitfields internals ---------------------------
    f_size = jax.jit(symbols.bit_size)
    bench_step("bit_size", lambda: f_size(blocks))

    f_runs = jax.jit(symbols.ac_run_lengths)
    bench_step("ac_run_lengths", lambda: f_runs(blocks))

    dc_code, dc_len, ac_code, ac_len = luts
    sym_np = rng.integers(0, 256, (B, 63)).astype(np.int32)
    sym = jax.device_put(jnp.asarray(sym_np))

    f_gather = jax.jit(
        lambda t, s: (ac_code[t[:, None].astype(jnp.int32), s],
                      ac_len[t[:, None].astype(jnp.int32), s])
    )
    bench_step("lut_gather_2x", lambda: f_gather(tbl, sym))

    flat = jax.jit(lambda t, s: t[:, None].astype(jnp.int32) * 256 + s)(tbl, sym)
    ac_code_flat = jnp.asarray(np.asarray(ac_code).reshape(512).astype(np.float32))
    ac_len_flat = jnp.asarray(np.asarray(ac_len).reshape(512).astype(np.float32))

    def onehot_lookup(f):
        oh = jax.nn.one_hot(f, 512, dtype=jnp.float32)
        c = jax.lax.dot_general(
            oh, ac_code_flat, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        l = jax.lax.dot_general(
            oh, ac_len_flat, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return c.astype(jnp.int32), l.astype(jnp.int32)

    f_oh = jax.jit(onehot_lookup)
    bench_step("lut_onehot_dot_2x", lambda: f_oh(flat))

    f_fields = jax.jit(
        lambda b, t: bitpack.build_bitfields(b, t, *luts)
    )
    bench_step("build_bitfields", lambda: f_fields(blocks, tbl))

    # --- Pallas pack level 1, isolated --------------------------------------
    f_pp = jax.jit(lambda b, t: pack_pallas.pack_level1_pallas(b, t, *luts))
    bench_step("pack_level1_pallas", lambda: f_pp(blocks, tbl))

    # level 2 on its own (scatter) for completeness
    buf_np = rng.integers(0, 2**31 - 1, (B, bitpack.BLOCK_WORDS + 1)).astype(np.uint32)
    t_b_np = rng.integers(20, 200, B).astype(np.int32)
    buf = jax.device_put(jnp.asarray(buf_np))
    t_b = jax.device_put(jnp.asarray(t_b_np))
    nwords = B * bitpack.WORDS_PER_BLOCK if hasattr(bitpack, "WORDS_PER_BLOCK") else B * 8
    f_l2 = jax.jit(lambda b, t: pack_pallas.pack_level2(b, t, 194400 * 8 + 2))
    bench_step("pack_level2_scatter", lambda: f_l2(buf, t_b))


if __name__ == "__main__":
    main()
