"""JFIF marker-level parser/writer robustness (crafted streams)."""

import io
import struct

import numpy as np
import pytest
from PIL import Image

from jpeg_tpu import decode, encode
from jpeg_tpu.io import jfif

from conftest import psnr


def _make_jpg(rng, h=32, w=32, **kw):
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    return img, encode(img, quality=80, **kw)


def test_parse_our_stream_fields(rng):
    img, jpg = _make_jpg(rng, subsampling="420", restart_interval=1)
    info = jfif.parse_jpeg(jpg)
    assert (info.width, info.height) == (32, 32)
    assert [c.comp_id for c in info.components] == [1, 2, 3]
    assert (info.components[0].h, info.components[0].v) == (2, 2)
    assert info.restart_interval == 1
    assert set(info.qtables) == {0, 1}
    assert set(info.htables) == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_combined_dht_segment(rng):
    """All four tables in ONE DHT segment (legal per B.2.4.2; libjpeg does
    this with optimize=True)."""
    img, jpg = _make_jpg(rng)
    info = jfif.parse_jpeg(jpg)
    # Rebuild the file with DHTs merged into a single segment.
    out = io.BytesIO()
    data = jpg
    pos = 2
    out.write(data[:2])
    dht_payloads = []
    segments = []
    while True:
        marker = data[pos + 1]
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos : pos + 2 + seglen]
        if marker == jfif.DHT:
            dht_payloads.append(seg[4:])
        elif marker == jfif.SOS:
            merged = b"".join(dht_payloads)
            out.write(struct.pack(">BBH", 0xFF, jfif.DHT, len(merged) + 2) + merged)
            out.write(data[pos:])
            break
        else:
            out.write(seg)
        pos += 2 + seglen
    merged_jpg = out.getvalue()
    info2 = jfif.parse_jpeg(merged_jpg)
    assert set(info2.htables) == set(info.htables)
    np.testing.assert_array_equal(decode(merged_jpg), decode(jpg))


def test_16bit_dqt(rng):
    """Pq=1 (16-bit) quant table values must parse."""
    img, jpg = _make_jpg(rng)
    info = jfif.parse_jpeg(jpg)
    q = np.asarray(info.qtables[0]).reshape(64)
    # Rewrite the first DQT as 16-bit precision.
    pos = 2
    out = io.BytesIO()
    out.write(jpg[:2])
    done = False
    data = jpg
    while True:
        marker = data[pos + 1]
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos : pos + 2 + seglen]
        if marker == jfif.DQT and not done:
            tq = seg[4] & 15
            zz = np.frombuffer(seg[5:69], np.uint8).astype(">u2")
            payload = bytes([(1 << 4) | tq]) + zz.tobytes()
            out.write(struct.pack(">BBH", 0xFF, jfif.DQT, len(payload) + 2) + payload)
            done = True
        else:
            out.write(seg)
        pos += 2 + seglen
        if marker == jfif.SOS:
            break
    out.write(data[pos:])
    info2 = jfif.parse_jpeg(out.getvalue())
    np.testing.assert_array_equal(info2.qtables[0], info.qtables[0])
    np.testing.assert_array_equal(decode(out.getvalue()), decode(jpg))


def test_trailing_garbage_after_eoi(rng):
    img, jpg = _make_jpg(rng)
    np.testing.assert_array_equal(decode(jpg + b"\x00garbage"), decode(jpg))


def test_app_and_com_segments_skipped(rng):
    img, jpg = _make_jpg(rng)
    # Inject APP13 + COM right after SOI.
    extra = (
        struct.pack(">BBH", 0xFF, 0xED, 10) + b"Adobe!!!"
        + struct.pack(">BBH", 0xFF, 0xFE, 7) + b"hello"
    )
    patched = jpg[:2] + extra + jpg[2:]
    np.testing.assert_array_equal(decode(patched), decode(jpg))


def test_missing_sos():
    data = b"\xff\xd8" + struct.pack(">BBH", 0xFF, 0xFE, 4) + b"hi" + b"\xff\xd9"
    with pytest.raises(jfif.JpegFormatError):
        jfif.parse_jpeg(data)


def test_comment_roundtrip(rng):
    img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    jpg = encode(img, comment="tpu-jpeg test comment")
    assert b"tpu-jpeg test comment" in jpg
    decode(jpg)  # still decodable


def test_write_parse_identity(rng):
    """Everything we write must parse back to the same structural fields."""
    for mode, r in [("444", 0), ("422", 3), ("420", 5)]:
        img, jpg = _make_jpg(rng, h=48, w=64, subsampling=mode,
                             restart_interval=r)
        info = jfif.parse_jpeg(jpg)
        assert info.restart_interval == r
        pil = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
        assert pil.shape == (48, 64, 3)
