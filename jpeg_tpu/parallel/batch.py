"""Batched, mesh-sharded encode: BASELINE.json config 4 ("4K batch-of-64 ...
parallel Huffman bitstream stitch"), host entropy finishing per image.

The device does everything through quantized/DPCM'd coefficients and global
symbol statistics (see parallel.shard); the host packs each image's scan —
per restart segment, so stripes stay independent units of work.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from jpeg_tpu.config import _as_subsampling
from jpeg_tpu.entropy import encode_np, huffman
from jpeg_tpu.io import jfif
from jpeg_tpu.models.encoder import interleave_mcus
from jpeg_tpu.ops import quant, tile
from jpeg_tpu.parallel import shard
from jpeg_tpu.parallel.mesh import make_mesh, to_host


def tables_from_histograms(hists: np.ndarray) -> dict:
    """(4, 256) [dc_luma, ac_luma, dc_chroma, ac_chroma] -> HuffTable dict."""
    return {
        (0, 0): huffman.optimal_table(hists[0]),
        (1, 0): huffman.optimal_table(hists[1]),
        (0, 1): huffman.optimal_table(hists[2]),
        (1, 1): huffman.optimal_table(hists[3]),
    }


def _encode_batch_device_packed(padded, orig_shape, qy, qc, mesh, mode,
                                optimize_tables: bool = False,
                                ) -> list[bytes] | None:
    """Device path: every stripe entropy-packs its own restart segment on its
    own shard; the host only finalizes (stuff/pad) and stitches with RSTn.
    With optimize_tables, a first device pass psums global symbol histograms
    (blocks never leave the chips) and the Annex-K.2 tables feed the packing
    pass — the two-pass flow of models.encoder, batch-sharded. Returns None
    if any stripe overflowed the per-block device cap."""
    from jpeg_tpu.ops import bitpack

    if optimize_tables:
        hists = to_host(shard.sharded_histograms(
            padded, qy, qc, mesh, mode, stripe_restart=True
        ))
        htables = tables_from_histograms(hists)
    else:
        htables = huffman.standard_tables()
    words, totals, ok = shard.sharded_encode_packed(
        padded, qy, qc, htables, mesh, mode
    )
    ok_np = to_host(ok)
    if not bool(ok_np.all()):
        return None
    totals_np = to_host(totals)
    words_np = to_host(words)
    b, h0, w0 = orig_shape[0], orig_shape[1], orig_shape[2]
    sp = mesh.shape["mcu"]
    nwords = words_np.shape[1] // sp

    hp, wp = padded.shape[1], padded.shape[2]
    mcu_cols = wp // mode.mcu_width
    mcu_rows = hp // mode.mcu_height
    dri = (mcu_rows // sp) * mcu_cols if sp > 1 else 0

    comps = [
        jfif.ComponentSpec(1, mode.h_factor, mode.v_factor, 0, 0, 0),
        jfif.ComponentSpec(2, 1, 1, 1, 1, 1),
        jfif.ComponentSpec(3, 1, 1, 1, 1, 1),
    ]
    out = []
    for i in range(b):
        scan = bitpack.finalize_stream(
            words_np[i].reshape(sp, nwords), totals_np[i])
        out.append(
            jfif.write_jpeg(
                w0, h0, comps, {0: qy, 1: qc}, htables, scan,
                restart_interval=dri,
            )
        )
    return out


def encode_batch(
    imgs,
    quality: int = 75,
    subsampling="420",
    mesh=None,
    stripe_restart: bool = True,
    optimize_tables: bool = False,
    device_pack: bool = False,
) -> list[bytes]:
    """Encode a batch of same-sized RGB images into independent JFIF streams.

    imgs: (B, H, W, 3) uint8. The device transform is sharded over
    (batch, mcu-stripe) mesh axes; with stripe_restart each stripe becomes a
    restart segment so entropy packing parallelizes per stripe too. With
    optimize_tables, one set of Annex-K.2 tables is derived from the psum'd
    global histograms and shared by the whole batch (one DHT per image, fed
    from collective statistics).
    """
    imgs = np.asarray(imgs)
    if imgs.ndim != 4 or imgs.shape[-1] != 3:
        raise ValueError(f"expected (B, H, W, 3), got {imgs.shape}")
    mode = _as_subsampling(subsampling)
    if mesh is None:
        mesh = make_mesh()
    sp = mesh.shape["mcu"]
    h0, w0 = imgs.shape[1], imgs.shape[2]

    # Pad spatially to MCU multiples and the stripe count.
    padded = tile.pad_to_multiple(
        jnp.asarray(imgs).transpose(1, 2, 0, 3), mode.mcu_height * sp, mode.mcu_width
    ).transpose(2, 0, 1, 3)

    qy = quant.luma_table(quality)
    qc = quant.chroma_table(quality)

    if device_pack and stripe_restart:
        out = _encode_batch_device_packed(
            padded, imgs.shape, qy, qc, mesh, mode,
            optimize_tables=optimize_tables,
        )
        if out is not None:
            return out
        # fall through to the host-pack path on block-cap overflow

    y, cb, cr, hists = shard.sharded_encode_blocks(
        padded, qy, qc, mesh, mode, stripe_restart=stripe_restart
    )
    y, cb, cr = to_host(y), to_host(cb), to_host(cr)
    hists = to_host(hists)

    hv = mode.h_factor * mode.v_factor
    hp, wp = padded.shape[1], padded.shape[2]
    mcu_cols = wp // mode.mcu_width
    mcu_rows = hp // mode.mcu_height
    n_mcu = mcu_rows * mcu_cols
    dri = (mcu_rows // sp) * mcu_cols if (stripe_restart and sp > 1) else 0

    htables = (
        tables_from_histograms(hists)
        if optimize_tables
        else huffman.standard_tables()
    )

    comps = [
        jfif.ComponentSpec(1, mode.h_factor, mode.v_factor, 0, 0, 0),
        jfif.ComponentSpec(2, 1, 1, 1, 1, 1),
        jfif.ComponentSpec(3, 1, 1, 1, 1, 1),
    ]
    out = []
    for i in range(imgs.shape[0]):
        blocks, tbl = interleave_mcus(y[i], cb[i], cr[i], hv)
        scan = encode_np.encode_scan(
            blocks, tbl, tbl, htables,
            restart_interval=dri, blocks_per_mcu=hv + 2,
        )
        out.append(
            jfif.write_jpeg(
                w0, h0, comps, {0: qy, 1: qc}, htables, scan,
                restart_interval=dri,
            )
        )
    return out


def decode_batch(jpegs, mesh=None, entropy: str = "auto") -> np.ndarray:
    """Decode a batch of same-geometry baseline JPEGs to (B, H, W, 3) uint8.

    The data-parallel twin of encode_batch (BASELINE.json config 4, decode
    direction): entropy decode runs per image on the host (C++ threads per
    restart segment, or the jitted device decoder with entropy="device"),
    then ONE sharded program — (batch, mcu-stripe) mesh axes with halo
    exchange for the triangular chroma upsample — finishes every image.
    Bit-identical to per-image decode() (fancy upsampling).

    All streams must share geometry, sampling mode, and quant tables (the
    batch-serving case); the MCU-row count must divide the ``mcu`` axis.
    """
    from jpeg_tpu.config import Subsampling
    from jpeg_tpu.models import layout
    from jpeg_tpu.models.decoder import _decode_scan

    if mesh is None:
        mesh = make_mesh()
    infos = [jfif.parse_jpeg(d) for d in jpegs]
    i0 = infos[0]
    comps0 = i0.components
    if len(comps0) != 3 or any(
        (c.h, c.v) != (1, 1) for c in comps0[1:]
    ):
        raise ValueError("decode_batch needs 3-component standard layouts")
    mode = next(
        (m for m in Subsampling
         if (m.h_factor, m.v_factor) == (comps0[0].h, comps0[0].v)),
        None,
    )
    if mode is None:
        raise ValueError(
            f"unsupported sampling {(comps0[0].h, comps0[0].v)} for the "
            "sharded path; decode images individually instead"
        )
    for info in infos[1:]:
        same = (
            (info.width, info.height) == (i0.width, i0.height)
            and [(c.h, c.v, c.qtab_id) for c in info.components]
            == [(c.h, c.v, c.qtab_id) for c in comps0]
            and all(
                np.array_equal(info.qtables[k], i0.qtables[k])
                for k in i0.qtables
            )
        )
        if not same:
            raise ValueError("decode_batch requires homogeneous streams")

    cy = comps0[0]
    # Narrow chroma planes (downsampled width <= 2) switch libjpeg — and our
    # per-image decoder — from triangular to replication upsampling
    # (decoder.upsample_choices). The sharded finisher only implements the
    # triangular path, so fall back to per-image decode for such tiny frames.
    if cy.h > 1 and layout.ceil_div(i0.width, cy.h) <= 2:
        from jpeg_tpu.models.decoder import decode as _decode_one

        return np.stack([_decode_one(d, entropy=entropy) for d in jpegs])

    hv = cy.h * cy.v
    mcu_rows = layout.ceil_div(i0.height, 8 * cy.v)
    mcu_cols = layout.ceil_div(i0.width, 8 * cy.h)
    n_mcu = mcu_rows * mcu_cols
    sp = mesh.shape["mcu"]
    if mcu_rows % sp:
        raise ValueError(
            f"{mcu_rows} MCU rows not divisible over {sp} stripes"
        )

    inv = layout.inverse_permutation(mcu_rows, mcu_cols, cy.v, cy.h)
    ys, cbs, crs = [], [], []
    mcu_layout = [
        (i, c.h * c.v, c.dc_id, c.ac_id) for i, c in enumerate(comps0)
    ]
    for info in infos:
        y, cb, cr = _decode_scan(info, n_mcu, mcu_layout, entropy)
        ys.append(y[inv] if hv > 1 else y)
        cbs.append(cb)
        crs.append(cr)

    qy = i0.qtables[comps0[0].qtab_id]
    qc = i0.qtables[comps0[1].qtab_id]
    px = to_host(
        shard.sharded_decode_pixels(
            np.stack(ys), np.stack(cbs), np.stack(crs), qy, qc,
            mcu_cols, mesh, mode,
        )
    )
    return px[:, : i0.height, : i0.width]
