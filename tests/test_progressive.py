"""Progressive (SOF2) decode: spectral selection + successive approximation.

PIL/libjpeg is the stream producer and the independent oracle (its standard
progressive script uses DC first+refine, AC first with EOB runs, and AC
refinement scans, always with optimized tables — exercising every scan kind
in entropy/progressive_np.py). Agreement is limited only by our float IDCT
vs libjpeg's fixed-point one, same as sequential streams (> 45 dB).
"""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_tpu.io import jfif
from jpeg_tpu.models.decoder import decode

from conftest import psnr


def _pil_progressive(img, **kw):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", progressive=True, **kw)
    return buf.getvalue()


@pytest.mark.parametrize("sub", [0, 1, 2])
@pytest.mark.parametrize("quality", [35, 75, 95])
def test_progressive_color_matches_pil(tiger, sub, quality):
    jpg = _pil_progressive(tiger, quality=quality, subsampling=sub)
    info = jfif.parse_jpeg(jpg)
    assert info.progressive and len(info.scans) > 3
    ours = decode(jpg)
    pil = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
    assert ours.shape == pil.shape == tiger.shape
    assert psnr(ours, pil) > 45.0, psnr(ours, pil)


def test_progressive_grayscale(tiger):
    jpg = _pil_progressive(tiger[..., 1], quality=80)
    ours = decode(jpg)
    pil = np.asarray(Image.open(io.BytesIO(jpg)).convert("L"))
    assert ours.shape == pil.shape
    assert psnr(ours, pil) > 45.0


@pytest.mark.parametrize("shape", [(8, 8), (17, 23), (64, 100)])
def test_progressive_odd_sizes(rng, shape):
    img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
    jpg = _pil_progressive(img, quality=85, subsampling=2)
    ours = decode(jpg)
    pil = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
    assert ours.shape == pil.shape
    # Pure-noise chroma at 4:2:0 maximizes upsample-filter divergence; the
    # 8x8 case sits at ~39 dB, real content (the color sweep above) at 45+.
    assert psnr(ours, pil) > 37.0, psnr(ours, pil)


def test_progressive_truncated_raises(tiger):
    jpg = _pil_progressive(tiger, quality=75)
    for cut in (len(jpg) // 3, 2 * len(jpg) // 3):
        try:
            decode(jpg[:cut])
        except (jfif.JpegFormatError, ValueError):
            pass  # must raise or return cleanly, never crash/hang


def test_progressive_info_fields(tiger):
    jpg = _pil_progressive(tiger, quality=75)
    info = jfif.parse_jpeg(jpg)
    # First scan is DC-first over all components; later scans are per-band.
    s0 = info.scans[0]
    assert (s0.ss, s0.ah) == (0, 0) and s0.se == 0
    assert any(s.ss > 0 and s.ah == 0 for s in info.scans)  # AC first
    assert any(s.ah > 0 for s in info.scans)  # refinement passes
