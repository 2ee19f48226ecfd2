"""Property-based fuzzing of the full encode/decode surface (hypothesis)."""

import io

import numpy as np
import pytest
from PIL import Image

from hypothesis import given, settings, strategies as st

from jpeg_tpu import decode, encode

from conftest import psnr


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    quality=st.integers(1, 100),
    mode=st.sampled_from(["444", "422", "420"]),
    restart=st.integers(0, 6),
    optimize=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_random_configs_produce_valid_jpeg(h, w, quality, mode, restart,
                                           optimize, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    jpg = encode(img, quality=quality, subsampling=mode,
                 restart_interval=restart, optimize_tables=optimize)
    # PIL (libjpeg) accepts it and agrees on geometry.
    pil = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
    assert pil.shape == img.shape
    # And our decoder agrees with PIL's pixels to high fidelity.
    ours = decode(jpg)
    assert ours.shape == img.shape
    if h * w >= 64:
        assert psnr(ours, pil) > 35.0


@settings(max_examples=10, deadline=None)
@given(
    quality=st.integers(1, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_gray_fuzz(quality, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(24, 16)).astype(np.uint8)
    jpg = encode(img, quality=quality)
    pil = np.asarray(Image.open(io.BytesIO(jpg)).convert("L"))
    ours = decode(jpg)
    assert psnr(ours, pil) > 40.0


@settings(max_examples=15, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_garbage_never_crashes_decoder(data):
    """Arbitrary bytes must raise a clean error or decode, never crash."""
    from jpeg_tpu.io import jfif

    try:
        decode(b"\xff\xd8" + data)
    except (jfif.JpegFormatError, ValueError, IndexError):
        pass
