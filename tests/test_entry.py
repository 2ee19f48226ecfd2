"""Driver entry points (__graft_entry__) under the virtual device mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as entry_mod


def test_entry_compiles():
    fn, args = entry_mod.entry()
    out = jax.jit(fn)(*args)
    y, cb, cr = out
    assert y.shape == (32 * 32, 64)  # 256x256 -> 1024 luma blocks
    assert cb.shape == (16 * 16, 64)  # 4:2:0 chroma at 128x128
    assert np.asarray(y).dtype == np.int32


def test_dryrun_multichip():
    n = min(8, len(jax.devices()))
    entry_mod.dryrun_multichip(n)
