"""BMP reader/writer vs the PIL oracle and the reference's sample assets."""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_tpu.io import bmp


@pytest.mark.parametrize("name", ["cam", "tiger"])
def test_reference_assets_match_pil(name, request):
    """The two BMPs shipped in the reference tree (SURVEY.md component 15):
    cam.bmp has a BITMAPV5 header, tiger.bmp a plain BITMAPINFOHEADER."""
    img = request.getfixturevalue(name)
    path = f"/root/reference/src/images/{name}.bmp"
    ref = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(img, ref)


def test_roundtrip_odd_width(rng):
    """Row padding: odd widths exercise the 4-byte row alignment the reference
    mishandles (README.md:18-19)."""
    for w in (1, 2, 3, 5, 127):
        rgb = rng.integers(0, 256, size=(7, w, 3)).astype(np.uint8)
        out = bmp.decode_bmp(bmp.encode_bmp(rgb))
        np.testing.assert_array_equal(out, rgb)


def test_written_bmp_readable_by_pil(rng):
    rgb = rng.integers(0, 256, size=(13, 21, 3)).astype(np.uint8)
    data = bmp.encode_bmp(rgb)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(pil, rgb)


def test_top_down_bmp(rng):
    rgb = rng.integers(0, 256, size=(4, 4, 3)).astype(np.uint8)
    data = bytearray(bmp.encode_bmp(rgb[::-1]))  # stored rows become top-down order
    # Flip the height sign to declare top-down.
    import struct

    struct.pack_into("<i", data, 22, -4)
    out = bmp.decode_bmp(bytes(data))
    np.testing.assert_array_equal(out, rgb[::-1][::-1])  # == rgb bottom-up flip twice


def test_errors():
    with pytest.raises(bmp.BmpError):
        bmp.decode_bmp(b"NOTABMP" * 20)
    with pytest.raises(bmp.BmpError):
        bmp.decode_bmp(b"BM" + b"\x00" * 100)  # zero dims / bad header
