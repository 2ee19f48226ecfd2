"""The decoder pipeline: JFIF JPEG bytes -> RGB/gray pixels.

The component the reference never wrote (`src/headers/jpg_decode.h` is an empty
include-guard shell — SURVEY.md component 16), designed from ITU-T T.81 with
the encoder stages defining the inverse contracts:

  host: JFIF parse, Huffman scan decode (per restart segment) -> device: ONE
  jitted program [de-zigzag, dequantize, IDCT, level unshift, chroma upsample,
  YCbCr->RGB, clip/round] -> crop to the declared frame size.

Sequential (SOF0/SOF1) and progressive (SOF2) Huffman modes, 8-bit, 1, 3 or
4 components (gray / YCbCr / RGB / Adobe CMYK+YCCK), arbitrary per-component
sampling factors 1-4 with integer upsampling ratios (covers
4:4:4/4:2:2/4:2:0/4:1:1/4:4:0 and mixed layouts), interleaved or
non-interleaved multi-scan — everything our encoder emits plus the common
libjpeg output formats.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np

from jpeg_tpu.entropy import decode_device, decode_np, native, progressive_np
from jpeg_tpu.io import jfif
from jpeg_tpu.models import layout
from jpeg_tpu.ops import color, dct, quant, subsample, tile, zigzag


def _reconstruct_plane(zz, qtab, blocks_shape, use_pallas: bool = False,
                       k: int = 8):
    """(N, 64) zig-zag quantized blocks -> (H*k/8, W*k/8) float plane
    (level-unshifted). k < 8 runs the DCT-domain scaled IDCT (libjpeg
    "draft"/jidctred semantics — dct.idct_scaled_basis): each 8x8 block
    reconstructs as k x k pixels from its lowest k x k frequencies.

    The output is range-limited to [0, 255] *before* any upsampling/color
    math, matching libjpeg's post-IDCT range_limit table: at extreme
    quantization (q=1) dequantized coefficients drive samples far out of
    range, and clamping order is observable through the triangular chroma
    upsample (discovered by the q=1 4:2:0 fuzz case)."""
    hb, wb = blocks_shape
    if k != 8:
        blocks = zigzag.from_zigzag(zz.reshape(hb, wb, 64))
        coeff = quant.dequantize(blocks, qtab)
        b = jnp.asarray(dct.idct_scaled_basis(k))
        small = jnp.einsum(
            "yu,abuv,xv->abyx", b, coeff, b,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        plane = small.transpose(0, 2, 1, 3).reshape(hb * k, wb * k) + 128.0
    elif use_pallas:
        from jpeg_tpu.ops import fused

        blocks = zigzag.from_zigzag(zz.reshape(hb, wb, 64))
        interp = jax.default_backend() == "cpu"
        plane = fused.fused_dequant_idct(
            tile.unblockify(blocks), qtab, interpret=interp
        )
    elif jax.default_backend() == "cpu":
        # Separable IDCT on CPU: the fused (64, 64) matmul costs 8x the
        # FLOPs, which only the MXU's idle capacity absorbs (same tradeoff
        # as ops/mcu_conv). Platform-local: the sharded finisher
        # (parallel/shard._stripe_decode) branches identically.
        blocks = zigzag.from_zigzag(zz.reshape(hb, wb, 64))
        coeff = quant.dequantize(blocks, qtab)
        plane = tile.unblockify(dct.idct_blocks(coeff)) + 128.0
    else:
        # De-zigzag + dequantize + IDCT as ONE (64, 64) MXU contraction: the
        # zig-zag permutation is folded into the matrix rows and the quant
        # table (permuted to zig-zag order) scales the input columns — no
        # gathers (see dct.zigzag_dct_matrix).
        from jpeg_tpu import tables

        qz = qtab.reshape(64)[jnp.asarray(tables.ZIGZAG_ORDER)].astype(
            jnp.float32)
        flat = dct.idct_zigzag_blocks(zz.reshape(-1, 64).astype(jnp.float32) * qz)
        plane = tile.plane_from_scan_blocks(flat, hb, wb) + 128.0
    # Integer samples, libjpeg range_limit semantics: libjpeg's IDCT emits
    # 8-bit samples BEFORE upsampling/color, so rounding here is the parity
    # point — and it makes every downstream op exact in f32 (triangle weights
    # are quarters of integers, the color matmul sees identical integer
    # inputs), which keeps sharded/batched finishing bit-identical to
    # single-device regardless of XLA fusion choices (a fused recompute once
    # flipped a 127.49998-vs-127.50000 pixel in the 4:1:1 sharded test).
    return jnp.clip(jnp.round(plane), 0.0, 255.0)


def _finish_color(y_zz, cb_zz, cr_zz, qy, qcb, qcr, shapes, factors,
                  fancy=(True, True, True), use_pallas: bool = False,
                  is_rgb: bool = False, k: int = 8):
    """shapes: per-component block grids (hb, wb); factors: per-component
    (fh, fv) upsampling ratios to the max-sampled grid (spec A.1.1 — any
    component may be subsampled relative to the others, not just chroma).
    fancy: per-component triangular-vs-replication choice (the caller applies
    libjpeg's jdsample.c selection, which gates fancy h2v1/h2v2 on the
    component's downsampled width being > 2).
    is_rgb: components are stored as R/G/B (Adobe APP14 transform=0 or
    'R','G','B' component ids) — skip the YCbCr matrix."""
    planes = []
    for zz, q, shape, (fh, fv), fan in zip(
        (y_zz, cb_zz, cr_zz), (qy, qcb, qcr), shapes, factors, fancy
    ):
        p = _reconstruct_plane(zz, q, shape, use_pallas, k)
        if fh > 1 or fv > 1:
            up = (
                subsample.fancy_upsample_factors
                if fan else subsample.upsample_factors
            )
            p = up(p, fv, fh)
        planes.append(p)
    ycc = jnp.stack(planes, axis=-1)
    rgb = ycc if is_rgb else color.ycbcr_to_rgb(ycc, clip=False)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def _finish_gray(zz, qy, shape, k: int = 8):
    plane = _reconstruct_plane(zz, qy, shape, k=k)
    return jnp.clip(jnp.round(plane), 0, 255).astype(jnp.uint8)


class YCbCrPlanes(typing.NamedTuple):
    """decode(output="ycbcr") result: per-component uint8 sample planes at
    their PADDED block-grid sizes (the full padded planes are required for
    an exact host finish — the triangular upsample's edge samples read the
    block-padding columns that the device RGB path also reads before its
    crop). `finish_ycbcr` reproduces decode(output="rgb") bit-exactly.

    For 4:2:0 the three planes total 1.5 bytes/pixel vs 3 for RGB — half
    the device->host transfer on bandwidth-bound links (VERDICT r4 item 7).
    """

    planes: tuple       # per-component 2-D uint8 arrays (np or device)
    height: int         # true output frame height (after scale_denom)
    width: int
    factors: tuple      # per-component (fh, fv) upsample ratios
    fancy: tuple        # per-component triangular-vs-replication choice


def _finish_planes(y_zz, cb_zz, cr_zz, qy, qcb, qcr, shapes,
                   use_pallas: bool = False, k: int = 8,
                   flat: bool = False):
    """Device half of the ycbcr output: per-component integer sample planes
    (the exact values _finish_color would feed its upsample/color tail),
    as uint8. flat=True returns ONE concatenated 1-D buffer instead of a
    tuple — the to-host case fetches it in a single d2h (three separate
    plane fetches each pay this container's per-transfer tunnel cost; a
    degrading window measured them at seconds apiece)."""
    planes = tuple(
        _reconstruct_plane(zz, q, shape, use_pallas, k).astype(jnp.uint8)
        for zz, q, shape in zip(
            (y_zz, cb_zz, cr_zz), (qy, qcb, qcr), shapes)
    )
    if flat:
        return jnp.concatenate([p.reshape(-1) for p in planes])
    return planes


def _split_flat_planes(buf: np.ndarray, shapes, k: int):
    """Host inverse of _finish_planes(flat=True)."""
    out = []
    off = 0
    for hb, wb in shapes:
        h, w = hb * k, wb * k
        out.append(buf[off:off + h * w].reshape(h, w))
        off += h * w
    return tuple(out)


@functools.cache
def _jit_finish_planes(shapes, use_pallas=False, k=8, flat=False):
    return jax.jit(functools.partial(
        _finish_planes, shapes=shapes, use_pallas=use_pallas, k=k,
        flat=flat))


@functools.cache
def _jit_finish_planes_sparse(B, Sp, Ep, Edp, comp_ranges, raster_geo,
                              shapes, use_pallas, k, flat=False):
    """Sparse one-program twin of _jit_finish_planes: densify + reorder +
    per-component plane reconstruction, stopping before upsample/color."""

    def program(payload, qy, qcb, qcr):
        rows = decode_device.densify_body(payload, B, Sp, Ep, Edp)
        zz = []
        for (lo, hi), geo in zip(comp_ranges, raster_geo):
            s = rows[lo:hi]
            if geo is not None:
                s = layout.scan_to_raster(s, *geo)
            zz.append(s)
        return _finish_planes(*zz, qy, qcb, qcr, shapes, use_pallas, k,
                              flat)

    return jax.jit(program)


def _np_triangle_axis(x: np.ndarray, axis: int) -> np.ndarray:
    """NumPy mirror of subsample._triangle_axis (same f32 expression order,
    so results are bit-identical for integer-valued inputs)."""
    x = np.moveaxis(x, axis, 0)
    prev = np.concatenate([x[:1], x[:-1]], axis=0)
    nxt = np.concatenate([x[1:], x[-1:]], axis=0)
    a = (np.float32(3.0) * x + prev) * np.float32(0.25)
    b = (np.float32(3.0) * x + nxt) * np.float32(0.25)
    out = np.stack([a, b], axis=1).reshape(2 * x.shape[0], *x.shape[1:])
    return np.moveaxis(out, 0, axis)


def _np_upsample(x: np.ndarray, fv: int, fh: int, fan: bool) -> np.ndarray:
    if not fan:
        return x.repeat(fv, axis=0).repeat(fh, axis=1)
    f = fh
    while f > 1:
        if f % 2:
            return x.repeat(fv, axis=0).repeat(f, axis=1)
        x = _np_triangle_axis(x, 1)
        f //= 2
    f = fv
    while f > 1:
        if f % 2:
            return x.repeat(f, axis=0)
        x = _np_triangle_axis(x, 0)
        f //= 2
    return x


def _finish_ycbcr_rows(p: YCbCrPlanes, r0: int, r1: int) -> np.ndarray:
    """finish_ycbcr for output rows [r0, r1): each component upsamples a
    halo-padded row slice and crops to the stripe, so the result is
    bit-identical to the full-array computation (the triangular filter has
    1-row support per doubling; the 4-row halo covers factors <= 4, and
    true top/bottom edges keep their replication semantics because the
    slice reaches the array edge there)."""
    planes = []
    for plane, (fh, fv), fan in zip(p.planes, p.factors, p.fancy):
        plane = np.asarray(plane)
        lo = max(0, r0 // fv - 4)
        hi = min(plane.shape[0], -(-r1 // fv) + 4)
        x = plane[lo:hi].astype(np.float32)
        if fh > 1 or fv > 1:
            x = _np_upsample(x, fv, fh, fan)
        planes.append(x[r0 - lo * fv: r1 - lo * fv])
    w = min(pl.shape[1] for pl in planes)
    ycc = np.stack([pl[:, :w] for pl in planes], axis=-1)
    x = ycc - color.YCBCR_OFFSET
    rgb = x @ color.YCBCR_TO_RGB.T.astype(np.float32)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def finish_ycbcr(p: YCbCrPlanes, threads: int | None = None) -> np.ndarray:
    """Host finish for decode(output="ycbcr"): upsample + YCbCr->RGB +
    round/clip + crop, bit-identical to decode(output="rgb") on the same
    stream (pinned by tests/test_ycbcr_output.py). All host f32 ops mirror
    the device finish expression for expression: integer uint8 samples make
    the triangle weights exact quarter-integers and each color channel is
    one f32 multiply-add chain in the same order as the device matmul row.

    Runs in row stripes on a thread pool (NumPy releases the GIL): the
    single-threaded finish costs ~400 ms for 4K, which would eat most of
    the halved-transfer win this output exists for. threads=1 forces the
    serial path; stripes are halo-exact, so thread count never changes
    bytes."""
    # Materialize device planes ONCE up front — per-stripe np.asarray
    # would re-fetch every plane per worker through the tunnel (r5 review
    # finding). .shape needs no transfer.
    p = p._replace(planes=tuple(np.asarray(pl) for pl in p.planes))
    y_rows = max(int(p.planes[0].shape[0]), p.height)
    if threads is None:
        import os

        threads = min(8, os.cpu_count() or 1)
    if threads <= 1 or y_rows < 256:
        return _finish_ycbcr_rows(p, 0, p.height)[:, : p.width]
    from concurrent.futures import ThreadPoolExecutor

    step = -(-p.height // threads)
    # Stripe boundaries on even rows: keeps every chroma doubling's
    # a/b sample pairing identical to the full computation.
    step += step % 2
    spans = [(r, min(r + step, p.height))
             for r in range(0, p.height, step)]
    with ThreadPoolExecutor(len(spans)) as pool:
        parts = list(pool.map(
            lambda s: _finish_ycbcr_rows(p, s[0], s[1]), spans))
    return np.concatenate(parts, axis=0)[:, : p.width]


def _finish_cmyk(zz1, zz2, zz3, zz4, q1, q2, q3, q4, shapes, factors,
                 fancy, ycck: bool, invert: bool):
    """Four-component (Adobe CMYK / YCCK) finishing program.

    ycck: components 1-3 are YCbCr-coded (APP14 transform=2) — run the
    inverse color matrix, then complement into stored-CMY space (libjpeg
    jdcolor.c ycck_cmyk_convert). invert: an Adobe APP14 marker is present,
    so match PIL's convention of returning the complement of the stored
    samples (JpegImagePlugin rawmode "CMYK;I")."""
    planes = []
    for zz, q, shape, (fh, fv), fan in zip(
        (zz1, zz2, zz3, zz4), (q1, q2, q3, q4), shapes, factors, fancy
    ):
        p = _reconstruct_plane(zz, q, shape)
        if fh > 1 or fv > 1:
            up = (
                subsample.fancy_upsample_factors
                if fan else subsample.upsample_factors
            )
            p = up(p, fv, fh)
        planes.append(p)
    if ycck:
        rgb = color.ycbcr_to_rgb(jnp.stack(planes[:3], axis=-1), clip=True)
        stored = jnp.stack(
            [255.0 - rgb[..., 0], 255.0 - rgb[..., 1], 255.0 - rgb[..., 2],
             planes[3]], axis=-1,
        )
    else:
        stored = jnp.stack(planes, axis=-1)
    out = 255.0 - stored if invert else stored
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


@functools.cache
def _jit_finish_cmyk(shapes, factors, fancy, ycck, invert):
    return jax.jit(
        functools.partial(_finish_cmyk, shapes=shapes, factors=factors,
                          fancy=fancy, ycck=ycck, invert=invert)
    )


def upsample_choices(width: int, components, hmax: int,
                     fancy_requested: bool) -> tuple:
    """Per-component fancy-vs-replication choice, mirroring libjpeg's
    jdsample.c start_pass: triangular ("fancy") upsampling applies only when
    the component's true downsampled width exceeds 2 samples — narrower
    planes fall back to pixel replication (observable at extreme
    quantization; found by the 16x4 q=1 4:2:0 fuzz case)."""
    out = []
    for c in components:
        cw = layout.ceil_div(width * c.h, hmax)
        out.append(bool(fancy_requested) and cw > 2)
    return tuple(out)


@functools.cache
def _jit_finish_color(shapes, factors, fancy=(True, True, True),
                      use_pallas=False, is_rgb=False, k=8):
    if isinstance(fancy, bool):  # convenience: one choice for all components
        fancy = (fancy,) * 3
    return jax.jit(
        functools.partial(_finish_color, shapes=shapes, factors=factors,
                          fancy=fancy, use_pallas=use_pallas, is_rgb=is_rgb,
                          k=k)
    )


def _sparse_finish_program(B, Sp, Ep, Edp, comp_ranges, raster_geo, shapes,
                           factors, fancy, use_pallas, is_rgb, k):
    """Whole sparse decode as ONE traceable program: densify the uploaded
    sparse payload, split/reorder per component (scan order -> plane raster
    order, reshape+transpose only), then the standard color finishing. Fusing
    these saves the per-dispatch tunnel cost of the separate densify, eager
    raster ops and finish calls (~22 ms EACH in this container).

    comp_ranges: per-component (lo, hi) block slices of the densified rows.
    raster_geo: per-component (mcu_rows, mcu_cols, v, h) or None when the
    component has one block per MCU (already raster-ordered)."""

    def program(payload, qy, qcb, qcr):
        rows = decode_device.densify_body(payload, B, Sp, Ep, Edp)
        zz = []
        for (lo, hi), geo in zip(comp_ranges, raster_geo):
            s = rows[lo:hi]
            if geo is not None:
                s = layout.scan_to_raster(s, *geo)
            zz.append(s)
        return _finish_color(*zz, qy, qcb, qcr, shapes=shapes,
                             factors=factors, fancy=fancy,
                             use_pallas=use_pallas, is_rgb=is_rgb, k=k)

    return program


@functools.cache
def _jit_finish_color_sparse(B, Sp, Ep, Edp, comp_ranges, raster_geo,
                             shapes, factors, fancy, use_pallas, is_rgb, k):
    return jax.jit(_sparse_finish_program(
        B, Sp, Ep, Edp, comp_ranges, raster_geo, shapes, factors, fancy,
        use_pallas, is_rgb, k,
    ))


@functools.cache
def _jit_finish_color_sparse_batch(K, B, Sp, Ep, Edp, comp_ranges,
                                   raster_geo, shapes, factors, fancy,
                                   use_pallas, is_rgb, k):
    """K-image sparse decode as ONE device program: vmap of the fused
    densify+reorder+finish over K payloads — the decode twin of the
    encoder's batched packed program (amortizes the fixed per-dispatch cost
    across K images). Takes K SEPARATE payload arguments (stacked inside the
    traced program) so callers can device_put each payload as soon as its
    host walk finishes — upload i overlaps walk/build i+1 instead of
    serializing behind one big stacked transfer (VERDICT r3 weak 1)."""
    body = _sparse_finish_program(
        B, Sp, Ep, Edp, comp_ranges, raster_geo, shapes, factors, fancy,
        use_pallas, is_rgb, k,
    )

    def program(*args):
        payloads = jnp.stack(args[:K])
        qy, qcb, qcr = args[K:]
        return jax.vmap(body, in_axes=(0, None, None, None))(
            payloads, qy, qcb, qcr)

    return jax.jit(program)


@functools.cache
def _jit_finish_gray(shape, k=8):
    return jax.jit(functools.partial(_finish_gray, shape=shape, k=k))


@functools.cache
def _jit_finish_gray_sparse(B, Sp, Ep, Edp, shape, k):
    """Gray twin of _jit_finish_color_sparse: densify the sparse payload and
    finish in ONE device program (no raster reorder — single-component scans
    are one block per MCU in plane order)."""

    def program(payload, qy):
        rows = decode_device.densify_body(payload, B, Sp, Ep, Edp)
        return _finish_gray(rows, qy, shape, k)

    return jax.jit(program)


def _progressive_backend(entropy: str) -> str:
    """Map decode()'s entropy selector onto the progressive scan walkers.
    Progressive has host backends only (numpy / native C++); the device
    selectors fall back to the best host one."""
    if entropy == "numpy":
        return "numpy"
    if entropy == "native":
        return "native"
    return "auto"


def _decode_scan(info: jfif.FrameInfo, n_mcu: int, mcu_layout: list,
                 entropy: str = "auto"):
    """Entropy-decode the scan with the selected backend.

    "auto": the sparse backend when a non-CPU device is attached and the
    layout allows (host C++ resolves the entropy layer in one walk, the
    device densifies — ~2 B per nonzero coefficient crosses the link instead
    of 128 B/block of dense coefficients), else the native (C++ thread pool)
    runtime when the layout allows (table ids 0/1, dc_id == ac_id — always
    true for our own streams), else the NumPy decoder.
    "native"/"numpy"/"device"/"indexed"/"sparse" force a backend; "device"
    runs the jitted per-restart-segment decoder, "indexed" the hybrid
    host-index + parallel-device-block decoder, "sparse" the host sparse walk
    + device densify (decode_device)."""
    for (_comp, _bpm, dc, ac) in mcu_layout:
        for key in ((0, dc), (1, ac)):
            if key not in info.htables:
                raise jfif.JpegFormatError(
                    f"scan references undefined Huffman table "
                    f"{'AC' if key[0] else 'DC'} {key[1]}"
                )
    if entropy == "device":
        return decode_device.decode_scan(
            info.scan_data, n_mcu, mcu_layout, info.htables,
            info.restart_interval,
        )
    native_ok = native.available() and all(
        dc == ac and dc in (0, 1) for (_, _, dc, ac) in mcu_layout
    )
    if entropy in ("native", "indexed", "sparse") and not native_ok:
        raise jfif.JpegFormatError(
            f"{entropy} entropy backend unavailable for this scan layout"
        )
    if entropy == "sparse" or (
        entropy == "auto" and native_ok and jax.default_backend() != "cpu"
    ):
        return decode_device.decode_scan_sparse(
            info.scan_data, n_mcu, mcu_layout, info.htables,
            info.restart_interval,
        )
    if entropy == "indexed":
        return decode_device.decode_scan_indexed(
            info.scan_data, n_mcu, mcu_layout, info.htables,
            info.restart_interval,
        )
    if native_ok and entropy in ("auto", "native"):
        return native.decode_scan(
            info.scan_data, n_mcu, mcu_layout, info.htables,
            info.restart_interval,
        )
    luts = {k: decode_np.make_decode_lut(t) for k, t in info.htables.items()}
    return decode_np.decode_scan(
        info.scan_data, n_mcu, mcu_layout, luts, info.restart_interval
    )


def _decode_noninterleaved(info: jfif.FrameInfo, mcu_rows: int, mcu_cols: int,
                           entropy: str = "auto"):
    """Multi-scan baseline: one component per scan, MCU = one block (A.2.2).

    Returns per-component (N, 64) zig-zag blocks in plane raster order, padded
    to the interleaved MCU grid the finishing program expects.
    """
    comps = info.components
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    by_id = {c.comp_id: (i, c) for i, c in enumerate(comps)}
    out = [None] * len(comps)

    for scan in info.scans:
        if len(scan.comp_ids) != 1:
            raise jfif.JpegFormatError(
                "partially interleaved scans are not supported"
            )
        cid, dc_id, ac_id = scan.comp_ids[0]
        ci, c = by_id[cid]
        # Component dimensions (T.81 A.1.1) and its own block grid.
        cw = layout.ceil_div(info.width * c.h, hmax)
        ch = layout.ceil_div(info.height * c.v, vmax)
        bw, bh = layout.ceil_div(cw, 8), layout.ceil_div(ch, 8)
        sub_info = jfif.FrameInfo(
            width=info.width, height=info.height, components=comps,
            qtables=info.qtables, htables=scan.htables,
            restart_interval=scan.restart_interval, scan_data=scan.data,
        )
        blocks = _decode_scan(sub_info, bh * bw, [(0, 1, dc_id, ac_id)],
                              entropy)[0]
        # Pad the raster grid up to the interleaved-MCU geometry.
        gh, gw = mcu_rows * c.v, mcu_cols * c.h
        grid = np.zeros((gh, gw, 64), dtype=blocks.dtype)
        grid[:bh, :bw] = blocks.reshape(bh, bw, 64)
        out[ci] = grid.reshape(gh * gw, 64)

    for ci, arr in enumerate(out):
        if arr is None:
            raise jfif.JpegFormatError(
                f"component {comps[ci].comp_id} has no scan"
            )
    return out


def _want_sparse_upload() -> bool:
    """Whether decode() should re-encode dense raster coefficient grids as
    the sparse payload before the device finish (transfer-bound non-CPU
    backends). Split out so tests can force the path on CPU."""
    return jax.default_backend() != "cpu"


def decode(data: bytes, fancy_upsample: bool = True,
           use_pallas: bool = False,
           max_pixels: int | None = 2_000_000_000,
           entropy: str = "auto",
           device_output: bool = False,
           scale_denom: int = 1,
           output: str = "rgb") -> np.ndarray:
    """Decode JPEG bytes to (H, W, 3) RGB, (H, W) gray, or — for Adobe
    4-component CMYK/YCCK streams — (H, W, 4) CMYK uint8 samples.

    fancy_upsample: triangular chroma interpolation (libjpeg-style) instead of
    pixel doubling — better quality on 4:2:2/4:2:0 streams.
    use_pallas: run dequantize+IDCT through the fused Pallas kernel (pixel
    output may differ by +-1 from the XLA path at rounding boundaries).
    max_pixels: allocation guard against adversarial headers (a 32-byte file
    can declare a 12.9-gigapixel frame); None disables.
    entropy: Huffman scan decode backend — "auto" (sparse when a non-CPU
    device is attached, else native C++ when the layout allows, else NumPy),
    "native", "numpy", "device" (jitted per-restart-segment decoder),
    "indexed" (host index pass + parallel device block decode), or "sparse"
    (host sparse-coefficient walk + device densify). All are bit-identical.
    device_output: return the decoded pixels as a device (jax) array instead
    of downloading to host memory — the serving case where the image feeds
    further on-device work (e.g. training-input pipelines).
    scale_denom: 1, 2, 4 or 8 — DCT-domain scaled decode (libjpeg "draft"
    mode): each block reconstructs at 8/scale_denom points per axis from its
    lowest frequencies; output is ceil(H/scale_denom) x ceil(W/scale_denom).
    The thumbnail-serving path: entropy decode is unchanged but the finishing
    program and the device->host transfer shrink by scale_denom^2.
    output: "rgb" (default) or "ycbcr" — return a YCbCrPlanes of the
    per-component uint8 sample planes instead of finished RGB (3-component
    YCbCr streams only). finish_ycbcr(planes) reproduces the RGB result
    bit-exactly on the host; for 4:2:0 the planes are half the d2h bytes of
    the finished RGB (the serving answer when the host link is the bound).
    """
    if entropy not in ("auto", "native", "numpy", "device", "indexed",
                       "sparse"):
        raise ValueError(f"unknown entropy backend {entropy!r}")
    if output not in ("rgb", "ycbcr"):
        raise ValueError(f"unknown output {output!r}")
    if scale_denom not in (1, 2, 4, 8):
        raise ValueError(f"scale_denom must be 1, 2, 4 or 8, got {scale_denom}")
    k = 8 // scale_denom
    info = jfif.parse_jpeg(data)
    if max_pixels is not None and info.width * info.height > max_pixels:
        raise jfif.JpegFormatError(
            f"frame {info.width}x{info.height} exceeds max_pixels={max_pixels}"
        )
    comps = info.components
    if output == "ycbcr" and len(comps) != 3:
        raise ValueError(
            f"output='ycbcr' needs a 3-component stream, got {len(comps)}")

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcu_rows = layout.ceil_div(info.height, 8 * vmax)
    mcu_cols = layout.ceil_div(info.width, 8 * hmax)
    n_mcu = mcu_rows * mcu_cols

    if len(comps) == 1:
        # Non-interleaved single-component scan: MCU = one block (spec A.2.2).
        mcu_rows = layout.ceil_div(info.height, 8)
        mcu_cols = layout.ceil_div(info.width, 8)
        n_mcu = mcu_rows * mcu_cols
        if info.progressive:
            scan_blocks = progressive_np.decode_progressive(
                info, backend=_progressive_backend(entropy)
            )[0]
        else:
            mcu_layout = [(0, 1, comps[0].dc_id, comps[0].ac_id)]
            c0 = comps[0]
            use_sparse = (
                native.available()
                and c0.dc_id == c0.ac_id and c0.dc_id in (0, 1)
                and (0, c0.dc_id) in info.htables
                and (1, c0.ac_id) in info.htables
                and (entropy == "sparse" or (
                    entropy == "auto" and jax.default_backend() != "cpu"
                ))
            )
            if use_sparse:
                # One fused program: densify + gray finishing (the gray twin
                # of the color path below — no raster reorder, one block/MCU).
                payload, B, Sp, Ep, Edp = decode_device.sparse_payload(
                    info.scan_data, n_mcu, mcu_layout, info.htables,
                    info.restart_interval,
                )
                qy = jnp.asarray(info.qtables[c0.qtab_id])
                out = _jit_finish_gray_sparse(
                    B, Sp, Ep, Edp, (mcu_rows, mcu_cols), k
                )(jnp.asarray(payload), qy)
                out = out[: layout.ceil_div(info.height, scale_denom),
                          : layout.ceil_div(info.width, scale_denom)]
                return out if device_output else np.asarray(out)
            scan_blocks = _decode_scan(info, n_mcu, mcu_layout, entropy)[0]
        qy = jnp.asarray(info.qtables[comps[0].qtab_id])
        out = _jit_finish_gray((mcu_rows, mcu_cols), k)(
            jnp.asarray(scan_blocks), qy
        )
        out = out[: layout.ceil_div(info.height, scale_denom),
                  : layout.ceil_div(info.width, scale_denom)]
        return out if device_output else np.asarray(out)

    if len(comps) not in (3, 4):
        raise jfif.JpegFormatError(f"unsupported component count {len(comps)}")
    for c in comps:
        if not (1 <= c.h <= 4 and 1 <= c.v <= 4):
            raise jfif.JpegFormatError(
                f"sampling factors out of range: {(c.h, c.v)}"
            )
        if hmax % c.h or vmax % c.v:
            raise jfif.JpegFormatError(
                f"non-integer upsampling ratio: {(c.h, c.v)} in a frame with "
                f"max factors {(hmax, vmax)}"
            )
    if sum(c.h * c.v for c in comps) > 10:
        raise jfif.JpegFormatError("more than 10 blocks per MCU (spec B.2.3)")

    sparse_fused = None  # (payload, B, Sp, Ep, Edp): the one-program path
    if info.progressive:
        zz = progressive_np.decode_progressive(
            info, backend=_progressive_backend(entropy)
        )
    elif len(info.scans) <= 1 and len(info.scans[0].comp_ids) == len(comps):
        mcu_layout = [
            (i, c.h * c.v, c.dc_id, c.ac_id) for i, c in enumerate(comps)
        ]
        use_sparse = (
            len(comps) == 3
            and native.available()
            and all(dc == ac and dc in (0, 1)
                    and (0, dc) in info.htables and (1, ac) in info.htables
                    for (_, _, dc, ac) in mcu_layout)
            and (entropy == "sparse" or (
                entropy == "auto" and jax.default_backend() != "cpu"
            ))
        )
        if use_sparse:
            # Sparse one-program path: host walk + payload build here; the
            # densify/reorder/finish all fuse into _jit_finish_color_sparse.
            sparse_fused = decode_device.sparse_payload(
                info.scan_data, n_mcu, mcu_layout, info.htables,
                info.restart_interval,
            )
            zz = None
        else:
            scans = _decode_scan(info, n_mcu, mcu_layout, entropy)
            # Scan order -> plane raster order per component (spec A.2.3), as
            # a reshape+transpose (device arrays from the hybrid backends
            # would pay a real row-gather otherwise).
            zz = [
                layout.scan_to_raster(s, mcu_rows, mcu_cols, c.v, c.h)
                if c.h * c.v > 1 else s
                for c, s in zip(comps, scans)
            ]
    else:
        zz = _decode_noninterleaved(info, mcu_rows, mcu_cols, entropy)

    # Dense raster grids (progressive streams, host entropy backends,
    # multi-scan) re-encode as the sparse payload when a non-CPU device is
    # attached (r5): uploading a 4K frame's int32 coefficient grids costs
    # ~50 MB on the host link vs ~1.3 MB sparse, and the payload feeds the
    # SAME fused densify+finish program — with no scan->raster reorder
    # stage, since these grids are already raster (zz_raster flags the
    # range builders below to skip it). Bits are identical either way.
    zz_raster = False
    if (zz is not None and len(comps) == 3 and _want_sparse_upload()
            and all(isinstance(z, np.ndarray) for z in zz)):
        # Host grids only: the "device"/"indexed" entropy backends hand
        # back device-resident arrays — converting those would force a
        # full dense download just to re-upload a payload.
        payload, B, Sp, Ep, Edp = decode_device.sparse_payload_from_blocks(
            [np.asarray(z) for z in zz])
        sparse_fused = (payload, B, Sp, Ep, Edp)
        zz = None
        zz_raster = True

    shapes = tuple((mcu_rows * c.v, mcu_cols * c.h) for c in comps)
    factors = tuple((hmax // c.h, vmax // c.v) for c in comps)
    qtabs = [jnp.asarray(info.qtables[c.qtab_id]) for c in comps]
    fancy = upsample_choices(info.width, comps, hmax, fancy_upsample)

    if len(comps) == 4:
        # Adobe CMYK (transform 0/absent) or YCCK (transform 2); returns
        # (H, W, 4) samples matching PIL's CMYK mode (complemented when the
        # Adobe APP14 marker is present — PIL rawmode "CMYK;I").
        if scale_denom != 1:
            raise jfif.JpegFormatError(
                "scaled decode of 4-component streams is not supported"
            )
        out = _jit_finish_cmyk(
            shapes, factors, fancy, info.adobe_transform == 2,
            info.adobe_transform is not None,
        )(*(jnp.asarray(z) for z in zz), *qtabs)
        out = out[: info.height, : info.width]
        return out if device_output else np.asarray(out)

    # Components stored as RGB (no color transform): Adobe APP14 with
    # transform=0, or literal 'R','G','B' component ids (libjpeg convention).
    is_rgb = info.adobe_transform == 0 or (
        info.adobe_transform is None
        and tuple(c.comp_id for c in comps) == (0x52, 0x47, 0x42)
    )
    if output == "ycbcr":
        if is_rgb:
            raise ValueError(
                "output='ycbcr' requires a YCbCr-coded stream (this one "
                "stores RGB components)")
        hlim = layout.ceil_div(info.height, scale_denom)
        wlim = layout.ceil_div(info.width, scale_denom)
        flat = not device_output  # one d2h transfer for the to-host case
        if sparse_fused is not None:
            payload, B, Sp, Ep, Edp = sparse_fused
            ranges, geo, base = [], [], 0
            for c in comps:
                bpm = c.h * c.v
                ranges.append((base, base + bpm * n_mcu))
                geo.append(
                    (mcu_rows, mcu_cols, c.v, c.h)
                    if bpm > 1 and not zz_raster else None)
                base += bpm * n_mcu
            planes = _jit_finish_planes_sparse(
                B, Sp, Ep, Edp, tuple(ranges), tuple(geo), shapes,
                bool(use_pallas), k, flat,
            )(jnp.asarray(payload), *qtabs)
        else:
            planes = _jit_finish_planes(shapes, bool(use_pallas), k, flat)(
                *(jnp.asarray(z) for z in zz), *qtabs)
        if flat:
            planes = _split_flat_planes(np.asarray(planes), shapes, k)
        return YCbCrPlanes(tuple(planes), hlim, wlim, factors, fancy)
    if sparse_fused is not None:
        payload, B, Sp, Ep, Edp = sparse_fused
        ranges, geo, base = [], [], 0
        for c in comps:
            bpm = c.h * c.v
            ranges.append((base, base + bpm * n_mcu))
            geo.append((mcu_rows, mcu_cols, c.v, c.h)
                       if bpm > 1 and not zz_raster else None)
            base += bpm * n_mcu
        out = _jit_finish_color_sparse(
            B, Sp, Ep, Edp, tuple(ranges), tuple(geo), shapes, factors,
            fancy, bool(use_pallas), is_rgb, k,
        )(jnp.asarray(payload), *qtabs)
        out = out[: layout.ceil_div(info.height, scale_denom),
                  : layout.ceil_div(info.width, scale_denom)]
        return out if device_output else np.asarray(out)
    out = _jit_finish_color(shapes, factors, fancy,
                            bool(use_pallas), is_rgb, k)(
        *(jnp.asarray(z) for z in zz), *qtabs
    )
    out = out[: layout.ceil_div(info.height, scale_denom),
              : layout.ceil_div(info.width, scale_denom)]
    return out if device_output else np.asarray(out)


def decode_batched(datas, fancy_upsample: bool = True,
                   device_output: bool = False,
                   scale_denom: int = 1,
                   batch_mode: str = "auto") -> np.ndarray:
    """Decode K same-geometry baseline JPEGs as one batch.

    The decode twin of the encoder's batched packed program (single-chip
    dispatch-floor amortization): each stream's entropy layer is resolved on
    the host by the sparse C++ walk (threaded across streams), payloads are
    padded to one shared size bucket, and the device densifies, reorders and
    finishes every image. Bit-identical to per-image decode().

    batch_mode selects the dispatch composition (identical pixels either
    way):
      "pipelined" — one shared-bucket fused program per image, dispatched
        back to back: the in-order link carries payload i+1's upload while
        image i's program runs (the double-buffering the encoder's pipeline
        uses). One compile total (shared buckets), K dispatches.
      "fused"     — all K payloads upload first, then ONE vmapped program
        decodes the batch. Minimum dispatch count, but the K uploads
        serialize ahead of any compute — measured 5x slower end-to-end on
        an upload-bound link (BENCH_r04 40.2 vs 209.2 MPix/s; DESIGN §6).
      "auto"      — "pipelined" for K >= 2 (every link this engine has run
        on is upload-bound; VERDICT r4 item 5), "fused" for K == 1.

    Requirements: native runtime available; homogeneous 3-component
    single-scan interleaved sequential streams — identical geometry, sampling
    factors, quant tables, per-component Huffman table *ids*, component ids
    and Adobe transform (Huffman table *contents* may differ per stream; they
    feed only the host walk). Returns (K, ceil(H/scale_denom),
    ceil(W/scale_denom), 3) uint8 (or the device array with device_output).
    """
    from concurrent.futures import ThreadPoolExecutor

    if batch_mode not in ("auto", "pipelined", "fused"):
        raise ValueError(f"unknown batch_mode {batch_mode!r}")
    if scale_denom not in (1, 2, 4, 8):
        raise ValueError(f"scale_denom must be 1, 2, 4 or 8, got {scale_denom}")
    if not datas:
        raise ValueError("decode_batched needs at least one stream")
    if not native.available():
        raise jfif.JpegFormatError(
            "decode_batched requires the native entropy runtime"
        )
    k = 8 // scale_denom
    infos = [jfif.parse_jpeg(d) for d in datas]
    i0 = infos[0]
    comps = i0.components
    if len(comps) != 3:
        raise ValueError("decode_batched needs 3-component streams")
    for info in infos:
        if info.progressive or len(info.scans) != 1 or len(
            info.scans[0].comp_ids
        ) != len(comps):
            raise ValueError(
                "decode_batched needs single-scan interleaved baseline streams"
            )
        if any(c.dc_id != c.ac_id or c.dc_id not in (0, 1)
               for c in info.components):
            raise ValueError("decode_batched needs table ids 0/1 per component")
        for c in info.components:
            if (0, c.dc_id) not in info.htables or (
                1, c.ac_id
            ) not in info.htables:
                raise jfif.JpegFormatError(
                    "scan references undefined Huffman table"
                )
    for info in infos[1:]:
        # Huffman table ids ARE part of the homogeneity key: mcu_layout is
        # built once from stream 0 and drives every stream's sparse walk, so
        # a stream with (dc_id, ac_id) assigned differently would be walked
        # with the wrong tables (parse errors at best, silently wrong pixels
        # at worst). Likewise adobe_transform / component ids select the
        # color transform, which runs once for the whole batch.
        same = (
            (info.width, info.height) == (i0.width, i0.height)
            and [(c.h, c.v, c.qtab_id, c.dc_id, c.ac_id)
                 for c in info.components]
            == [(c.h, c.v, c.qtab_id, c.dc_id, c.ac_id) for c in comps]
            and info.adobe_transform == i0.adobe_transform
            and [c.comp_id for c in info.components]
            == [c.comp_id for c in comps]
            and all(t in info.qtables
                    and np.array_equal(info.qtables[t], i0.qtables[t])
                    for t in i0.qtables)
        )
        if not same:
            raise ValueError("decode_batched requires homogeneous streams")

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcu_rows = layout.ceil_div(i0.height, 8 * vmax)
    mcu_cols = layout.ceil_div(i0.width, 8 * hmax)
    n_mcu = mcu_rows * mcu_cols
    mcu_layout = [
        (i, c.h * c.v, c.dc_id, c.ac_id) for i, c in enumerate(comps)
    ]

    # Host sparse walks, threaded across streams (each walk also threads
    # across its own restart segments; restart-free streams are serial per
    # stream, so stream-level threading is what overlaps them).
    def walk(info):
        return native.sparse_scan(
            info.scan_data, n_mcu, mcu_layout, info.htables,
            info.restart_interval,
        )

    with ThreadPoolExecutor(min(4, max(1, len(infos)))) as pool:
        walks = list(pool.map(walk, infos))
    Sp = decode_device.sparse_bucket(max(w[0].shape[0] for w in walks))
    Ep = decode_device.exception_bucket(max(
        int(np.count_nonzero(np.abs(w[0].astype(np.int32)) > 7))
        for w in walks
    ))
    Edp = decode_device.exception_bucket(max(
        decode_device.dc_diff_exceptions(w[3]) for w in walks
    ))
    B = walks[0][2].shape[0]

    ranges, geo, base = [], [], 0
    for c in comps:
        bpm = c.h * c.v
        ranges.append((base, base + bpm * n_mcu))
        geo.append((mcu_rows, mcu_cols, c.v, c.h) if bpm > 1 else None)
        base += bpm * n_mcu
    shapes = tuple((mcu_rows * c.v, mcu_cols * c.h) for c in comps)
    factors = tuple((hmax // c.h, vmax // c.v) for c in comps)
    fancy = upsample_choices(i0.width, comps, hmax, fancy_upsample)
    qtabs = [jnp.asarray(i0.qtables[c.qtab_id]) for c in comps]
    is_rgb = i0.adobe_transform == 0 or (
        i0.adobe_transform is None
        and tuple(c.comp_id for c in comps) == (0x52, 0x47, 0x42)
    )
    hlim = layout.ceil_div(i0.height, scale_denom)
    wlim = layout.ceil_div(i0.width, scale_denom)

    if batch_mode == "fused" or (batch_mode == "auto" and len(walks) == 1):
        # Build + upload each payload separately: device_put is async, so
        # the transfer of payload i rides the link while payload i+1 is
        # being packed, instead of serializing one big stacked upload after
        # all the host work (VERDICT r3 weak 1).
        dev_payloads = [
            jax.device_put(decode_device.build_payload(*w, Sp, Ep, Edp))
            for w in walks
        ]
        out = _jit_finish_color_sparse_batch(
            len(dev_payloads), B, Sp, Ep, Edp, tuple(ranges), tuple(geo),
            shapes, factors, fancy, False, is_rgb, k,
        )(*dev_payloads, *qtabs)
        out = out[:, :hlim, :wlim]
        return out if device_output else np.asarray(out)

    # Pipelined: dispatch the shared-bucket per-image fused program right
    # after each payload upload — program i computes while payload i+1's
    # transfer rides the in-order link (VERDICT r4 item 5: cross-batch
    # double-buffering). Shared buckets keep this at ONE compiled program
    # for the whole batch; the host-side payload builds run on a worker
    # thread so build i+1 overlaps dispatch i too.
    fn = _jit_finish_color_sparse(
        B, Sp, Ep, Edp, tuple(ranges), tuple(geo), shapes, factors,
        fancy, False, is_rgb, k,
    )
    def _build(wlk):
        return jax.device_put(decode_device.build_payload(*wlk, Sp, Ep, Edp))

    outs = []
    with ThreadPoolExecutor(1) as pool:
        # Bounded two-deep prefetch: submit build i+1 while consuming i,
        # so at most two payloads are in flight (true double-buffering —
        # an all-upfront submit would hold every payload resident at
        # once).
        nxt = pool.submit(_build, walks[0])
        for wlk in walks[1:]:
            dev = nxt.result()
            nxt = pool.submit(_build, wlk)
            outs.append(fn(dev, *qtabs)[:hlim, :wlim])
        outs.append(fn(nxt.result(), *qtabs)[:hlim, :wlim])
    if device_output:
        return jnp.stack(outs)
    # Per-image host fetches drain in dispatch order, overlapping the
    # remaining programs.
    return np.stack([np.asarray(o) for o in outs])
