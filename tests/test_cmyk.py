"""Four-component (Adobe CMYK / YCCK) decode — foreign-stream coverage.

PIL/libjpeg is both the producer (CMYK saves) and the independent oracle.
decode() returns (H, W, 4) samples matching PIL's CMYK mode, i.e. the
complement of the stored samples whenever the Adobe APP14 marker is present
(PIL rawmode "CMYK;I"). The YCCK case (APP14 transform=2) is produced by our
own writer — hand-assembled from the encoder's plane transforms — and PIL
must agree with our decode of it.
"""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_tpu import decode
from jpeg_tpu.io import jfif

from conftest import psnr


def _pil_cmyk(arr, **kw):
    buf = io.BytesIO()
    Image.fromarray(arr, mode="CMYK").save(buf, "JPEG", **kw)
    return buf.getvalue()


@pytest.mark.parametrize("shape", [(32, 48), (17, 23)])
def test_cmyk_matches_pil(rng, shape):
    a = rng.integers(0, 256, (*shape, 4)).astype(np.uint8)
    jpg = _pil_cmyk(a, quality=92)
    info = jfif.parse_jpeg(jpg)
    assert len(info.components) == 4 and info.adobe_transform == 0
    ours = decode(jpg)
    pil = np.asarray(Image.open(io.BytesIO(jpg)))
    assert ours.shape == pil.shape == a.shape
    assert psnr(ours, pil) > 55.0  # float-vs-fixed-point IDCT only


def test_cmyk_smooth_content(rng):
    yy, xx = np.mgrid[0:40, 0:56]
    a = np.stack([xx * 4, yy * 6, (xx + yy) * 2, xx * 2 + yy], -1)
    a = np.clip(a, 0, 255).astype(np.uint8)
    jpg = _pil_cmyk(a, quality=95)
    ours = decode(jpg)
    pil = np.asarray(Image.open(io.BytesIO(jpg)))
    assert psnr(ours, pil) > 55.0
    assert psnr(ours, a) > 30.0  # smooth content survives the codec


def _craft_ycck(cmyk_pil_space, quality=95):
    """Build a YCCK (Adobe transform=2) stream whose PIL decode should equal
    `cmyk_pil_space`: stored CMY = 255 - RGB'(YCbCr), stored K = 255 - k,
    and PIL complements everything back (CMYK;I)."""
    import jax.numpy as jnp

    from jpeg_tpu.entropy import huffman, native, encode_np
    from jpeg_tpu.models import encoder as E
    from jpeg_tpu.ops import color, quant, tile

    a = cmyk_pil_space.astype(np.float32)
    h, w = a.shape[:2]
    # PIL-space CMY values equal the YCbCr-converted R'G'B' (see decoder
    # docstring); K plane is complemented into stored space.
    ycc = np.asarray(color.rgb_to_ycbcr(jnp.asarray(a[..., :3])))
    planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2], 255.0 - a[..., 3]]
    qy = quant.luma_table(quality)
    zzs = []
    for p in planes:
        padded = tile.pad_to_multiple(
            jnp.asarray(np.clip(np.round(p), 0, 255).astype(np.uint8)), 8, 8
        )
        zz = np.asarray(E._jit_gray()(padded, jnp.asarray(qy)))
        zz = zz.copy()
        zz[:, 0] = E._dpcm_host(zz[:, 0], 0)
        zzs.append(zz)
    n = zzs[0].shape[0]
    blocks = np.stack(zzs, axis=1).reshape(-1, 64)  # MCU-interleaved, bpm=4
    tbl = np.zeros(blocks.shape[0], dtype=np.uint8)
    htables = huffman.standard_tables()
    if native.available():
        scan = native.encode_scan(blocks, tbl, htables, 0, 4)
    else:
        scan = encode_np.encode_scan(blocks, tbl, tbl, htables, 0, 4)
    comps = [jfif.ComponentSpec(i + 1, 1, 1, 0, 0, 0) for i in range(4)]
    htables = {(0, 0): htables[(0, 0)], (1, 0): htables[(1, 0)]}
    return jfif.write_jpeg(w, h, comps, {0: qy}, htables, scan,
                           adobe_transform=2)


def test_ycck_crafted_stream_pil_and_ours_agree(rng):
    yy, xx = np.mgrid[0:32, 0:40]
    a = np.clip(
        np.stack([xx * 5, yy * 7, (xx + yy) * 3, 255 - xx * 4], -1), 0, 255
    ).astype(np.uint8)
    jpg = _craft_ycck(a)
    info = jfif.parse_jpeg(jpg)
    assert info.adobe_transform == 2 and len(info.components) == 4
    pil_img = Image.open(io.BytesIO(jpg))
    assert pil_img.mode == "CMYK"
    pil = np.asarray(pil_img.convert("CMYK"))
    ours = decode(jpg)
    assert ours.shape == pil.shape == a.shape
    assert psnr(ours, pil) > 50.0, psnr(ours, pil)
    assert psnr(ours, a) > 30.0


def test_cmyk_entropy_backends_identical(rng):
    a = rng.integers(0, 256, (24, 24, 4)).astype(np.uint8)
    jpg = _pil_cmyk(a, quality=90)
    ref = decode(jpg, entropy="numpy")
    for backend in ("native", "device"):
        np.testing.assert_array_equal(decode(jpg, entropy=backend), ref)


def test_cmyk_to_rgb_matches_pil(rng):
    from jpeg_tpu.ops.color import cmyk_to_rgb

    a = rng.integers(0, 256, (37, 21, 4)).astype(np.uint8)
    ours = cmyk_to_rgb(a)
    pil = np.asarray(Image.fromarray(a, "CMYK").convert("RGB"))
    np.testing.assert_array_equal(ours, pil)
    with pytest.raises(ValueError):
        cmyk_to_rgb(a[..., :3])


def test_cli_decode_cmyk_to_bmp(rng, tmp_path):
    import subprocess
    import sys

    a = rng.integers(0, 256, (24, 40, 4)).astype(np.uint8)
    jpg_path = tmp_path / "c.jpg"
    jpg_path.write_bytes(_pil_cmyk(a, quality=95))
    out = tmp_path / "c.bmp"
    import os

    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    p = subprocess.run(
        [sys.executable, "-m", "jpeg_tpu", "decode", str(jpg_path), str(out)],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert p.returncode == 0, p.stderr[-1500:]
    from jpeg_tpu.io import bmp as bmp_io

    got = bmp_io.read_bmp(str(out))
    pil = np.asarray(Image.open(io.BytesIO(jpg_path.read_bytes())).convert("RGB"))
    assert got.shape == pil.shape
    assert psnr(got, pil) > 50.0
