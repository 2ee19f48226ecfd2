"""Non-interleaved (multi-scan) baseline encoding: one SOS per component
(T.81 A.2.2). Some pipelines prefer this layout — components decode
independently, and a gray preview needs only the first scan. Our decoder and
libjpeg both read it; tests verify byte-level structure and pixel agreement.
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from jpeg_tpu import tables as T
from jpeg_tpu.config import EncodeConfig, Subsampling
from jpeg_tpu.entropy import encode_np, huffman, native
from jpeg_tpu.io import bmp, jfif
from jpeg_tpu.models import encoder as E
from jpeg_tpu.ops import quant, tile


def encode_noninterleaved(
    image,
    quality: int = 75,
    restart_interval: int = 0,
    optimize_tables: bool = False,
) -> bytes:
    """Encode RGB to a 3-scan non-interleaved baseline JFIF stream.

    Always 4:4:4 (with (1,1) sampling everywhere, non-interleaved and
    interleaved MCU geometry coincide, so every baseline decoder agrees on
    the layout)."""
    if isinstance(image, str):
        image = bmp.read_bmp(image)
    image = np.asarray(image)
    if image.ndim != 3 or image.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3), got {image.shape}")
    cfg = EncodeConfig(quality=quality, subsampling="444",
                       restart_interval=restart_interval,
                       optimize_tables=optimize_tables)
    h0, w0 = image.shape[:2]
    mode = Subsampling.YUV444

    img = tile.pad_to_multiple(jnp.asarray(image), 8, 8)
    qy_np, qc_np = quant.luma_table(quality), quant.chroma_table(quality)
    y, cb, cr = (
        np.asarray(a).astype(np.int64)
        for a in E._jit_color(mode)(img, jnp.asarray(qy_np), jnp.asarray(qc_np))
    )

    r = cfg.restart_interval
    comps = [(1, 0, y), (2, 1, cb), (3, 1, cr)]
    scans = []
    all_blocks = []
    for cid, tid, blocks in comps:
        b = blocks.copy()
        b[:, 0] = E._dpcm_host(b[:, 0], r)
        tbl = np.full(len(b), tid, dtype=np.int64)
        all_blocks.append((b, tbl))

    if optimize_tables:
        freqs = None
        for b, tbl in all_blocks:
            if native.available():
                f = native.count_frequencies(b, tbl)
            else:
                f = encode_np.count_frequencies(
                    encode_np.build_records(b, tbl, tbl)
                )
            if freqs is None:
                freqs = {k: v.copy() for k, v in f.items()}
            else:
                for k in freqs:
                    freqs[k] = freqs[k] + f[k]
        htables = {k: huffman.optimal_table(v) for k, v in freqs.items()}
    else:
        htables = huffman.standard_tables()

    for (cid, tid, _), (b, tbl) in zip(comps, all_blocks):
        if native.available():
            scan = native.encode_scan(b, tbl, htables, restart_interval=r,
                                      blocks_per_mcu=1)
        else:
            scan = encode_np.encode_scan(b, tbl, tbl, htables,
                                         restart_interval=r, blocks_per_mcu=1)
        scans.append((cid, tid, scan))

    out = [b"\xff\xd8"]
    app0 = b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 1, 72, 72, 0, 0)
    out.append(struct.pack(">BBH", 0xFF, jfif.APP0, len(app0) + 2) + app0)
    for qid, q in [(0, qy_np), (1, qc_np)]:
        zz = np.asarray(q, np.int32).reshape(64)[T.ZIGZAG_ORDER]
        out.append(struct.pack(">BBH", 0xFF, jfif.DQT, 67) + bytes([qid])
                   + bytes(int(x) for x in zz))
    sof = struct.pack(">BHHB", 8, h0, w0, 3)
    for cid, qid in [(1, 0), (2, 1), (3, 1)]:
        sof += struct.pack(">BBB", cid, 0x11, qid)
    out.append(struct.pack(">BBH", 0xFF, jfif.SOF0, len(sof) + 2) + sof)
    for (is_ac, tid), t in sorted(htables.items()):
        if len(t.vals) == 0:
            continue
        p = bytes([(is_ac << 4) | tid]) + bytes(int(x) for x in t.bits) \
            + bytes(int(x) for x in t.vals)
        out.append(struct.pack(">BBH", 0xFF, jfif.DHT, len(p) + 2) + p)
    if r:
        out.append(struct.pack(">BBHH", 0xFF, jfif.DRI, 4, r))
    for cid, tid, scan in scans:
        sos = bytes([1]) + struct.pack(">BB", cid, (tid << 4) | tid) \
            + bytes([0, 63, 0])
        out.append(struct.pack(">BBH", 0xFF, jfif.SOS, len(sos) + 2) + sos)
        out.append(scan)
    out.append(b"\xff\xd9")
    return b"".join(out)
