"""VERDICT r2 item 6: retry the Mosaic compile of the Pallas level-1 packer
with smaller tiles (the (TILE, 63, 1024) one-hot intermediates are the OOM
suspect). Tries TILE = 16 (round-2 failure baseline), 8, 4, 2 in separate
SUBPROCESSES so an OOM-killed remote compile doesn't end the parent.

Usage: timeout 2400 python tools/pallas_pack_retry.py
"""

from __future__ import annotations

import os
import subprocess
import sys

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(root)r)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", %(cache)r)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jpeg_tpu.ops import bitpack, pack_pallas
from jpeg_tpu.entropy import huffman

tile = int(sys.argv[1])
pack_pallas.TILE = tile
print(f"devices: {jax.devices()}, TILE={tile}", flush=True)
rng = np.random.default_rng(0)
n = 4096
blocks = np.zeros((n, 64), np.int32)
mask = rng.random((n, 64)) < 0.2
blocks[mask] = rng.integers(-200, 201, mask.sum())
tbl = (rng.random(n) < 0.3).astype(np.int32)
luts = tuple(jnp.asarray(a)
             for a in bitpack.luts_from_tables(huffman.standard_tables()))
t0 = time.time()
buf, t_b = pack_pallas.pack_level1_pallas(
    jnp.asarray(blocks), jnp.asarray(tbl), *luts, interpret=False)
np.asarray(t_b[:1])
print(f"TILE={tile}: compiled+ran in {time.time()-t0:.1f}s", flush=True)
# cross-check vs the XLA packer
bits, nbits = bitpack.build_bitfields(jnp.asarray(blocks), jnp.asarray(tbl), *luts)
ref_words, ref_total, ok = bitpack.pack_bits(bits, nbits, n * 8 + 2)
words, total, ok2 = pack_pallas.pack_level2(buf, t_b, n * 8 + 2)
same = bool(np.asarray((total == ref_total) & jnp.all(words == ref_words)))
print(f"TILE={tile}: byte-identical to XLA packer: {same}", flush=True)
"""


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(root, ".jax_cache")
    for tile in (16, 8, 4, 2):
        print(f"--- attempting Mosaic compile, TILE={tile} ---", flush=True)
        try:
            p = subprocess.run(
                [sys.executable, "-c", CHILD % {"root": root, "cache": cache},
                 str(tile)],
                capture_output=True, text=True, timeout=600,
            )
            sys.stdout.write(p.stdout)
            tail = "\n".join(p.stderr.splitlines()[-6:])
            if p.returncode != 0:
                print(f"TILE={tile}: FAILED rc={p.returncode}\n{tail}",
                      flush=True)
            else:
                print(f"TILE={tile}: SUCCESS", flush=True)
                return 0
        except subprocess.TimeoutExpired:
            print(f"TILE={tile}: timed out (600s)", flush=True)
    print("all tile sizes failed", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
