"""Command-line driver: the L5 layer of SURVEY.md's map (replaces the
edit-main-and-recompile jpg_driver.c with real subcommands).

  python -m jpeg_tpu encode in.bmp out.jpg --quality 85 --subsampling 420
  python -m jpeg_tpu decode in.jpg out.bmp
  python -m jpeg_tpu roundtrip in.bmp --quality 75     # PSNR / bpp report
  python -m jpeg_tpu info in.jpg                       # marker dump
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _add_encode_flags(p):
    p.add_argument("--quality", "-q", type=int, default=75)
    p.add_argument("--subsampling", "-s", default="420",
                   choices=["444", "422", "420", "411", "440"])
    p.add_argument("--restart-interval", "-r", type=int, default=0,
                   help="MCUs per restart segment (0 = none)")
    p.add_argument("--optimize-tables", action="store_true",
                   help="per-image Annex-K.2 Huffman tables")
    p.add_argument("--grayscale", action="store_true",
                   help="encode luma only")
    p.add_argument("--progressive", action="store_true",
                   help="progressive (SOF2) stream: libjpeg's standard "
                        "scan script, per-scan optimal tables")
    p.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace of the encode here")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="jpeg_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("encode", help="BMP -> JPEG")
    enc.add_argument("input")
    enc.add_argument("output")
    _add_encode_flags(enc)

    dec = sub.add_parser("decode", help="JPEG -> BMP")
    dec.add_argument("input")
    dec.add_argument("output")
    dec.add_argument("--entropy", default="auto",
                     choices=["auto", "native", "numpy", "device", "indexed",
                              "sparse"],
                     help="Huffman scan decode backend (all bit-identical)")
    dec.add_argument("--scale-denom", type=int, default=1,
                     choices=[1, 2, 4, 8],
                     help="DCT-domain scaled decode (libjpeg draft mode): "
                          "output is ceil(H/d) x ceil(W/d)")

    rt = sub.add_parser("roundtrip", help="encode+decode, report PSNR/bpp")
    rt.add_argument("input")
    _add_encode_flags(rt)

    info = sub.add_parser("info", help="dump JPEG structure")
    info.add_argument("input")

    mos = sub.add_parser("mosaic", help="stripe-sharded single-JFIF encode")
    mos.add_argument("input")
    mos.add_argument("output")
    mos.add_argument("--quality", "-q", type=int, default=75)
    mos.add_argument("--subsampling", "-s", default="420",
                     choices=["444", "422", "420", "411", "440"])
    mos.add_argument("--devices", "-d", type=int, default=None,
                     help="number of devices to stripe over (default: all)")
    mos.add_argument("--optimize-tables", action="store_true")
    mos.add_argument("--stream", action="store_true",
                     help="stream stripes from disk (bounded memory; for "
                          "inputs too large to materialize)")
    mos.add_argument("--stripe-rows", type=int, default=None,
                     help="rows per streamed stripe (default ~32 MB)")

    bat = sub.add_parser(
        "batch", help="pipelined many-file encode (BMP->JPEG) or decode "
        "(JPEG->BMP) via the streaming serving APIs")
    bat.add_argument("inputs", nargs="+")
    bat.add_argument("--outdir", "-o", required=True)
    bat.add_argument("--decode", action="store_true",
                     help="decode JPEGs to BMPs instead of encoding")
    bat.add_argument("--quality", "-q", type=int, default=75)
    bat.add_argument("--subsampling", "-s", default="420",
                     choices=["444", "422", "420", "411", "440"])
    bat.add_argument("--depth", type=int, default=2,
                     help="device dispatches kept in flight")

    args = ap.parse_args(argv)

    from jpeg_tpu import decode, encode
    from jpeg_tpu.io import bmp

    if args.cmd == "encode":
        img = bmp.read_bmp(args.input)
        if args.grayscale:
            from jpeg_tpu.ops import color
            import jax.numpy as jnp
            img = np.asarray(
                color.rgb_to_ycbcr(jnp.asarray(img))[..., 0]
            ).round().clip(0, 255).astype(np.uint8)
        import contextlib

        if args.trace_dir:
            import jax

            tracer = jax.profiler.trace(args.trace_dir)
        else:
            tracer = contextlib.nullcontext()
        t0 = time.time()
        with tracer:
            if args.progressive:
                from jpeg_tpu.models.progressive_enc import encode_progressive

                if args.restart_interval:
                    raise SystemExit(
                        "--progressive does not emit restart intervals")
                data = encode_progressive(
                    img, quality=args.quality,
                    subsampling=args.subsampling)
            else:
                data = encode(
                    img, quality=args.quality, subsampling=args.subsampling,
                    restart_interval=args.restart_interval,
                    optimize_tables=args.optimize_tables,
                )
        dt = time.time() - t0
        with open(args.output, "wb") as f:
            f.write(data)
        mp = img.shape[0] * img.shape[1] / 1e6
        print(f"{args.input} -> {args.output}: {len(data)} bytes, "
              f"{dt*1e3:.1f} ms ({mp/dt:.1f} MPix/s)")
        return 0

    if args.cmd == "decode":
        with open(args.input, "rb") as f:
            data = f.read()
        t0 = time.time()
        img = decode(data, entropy=args.entropy,
                     scale_denom=args.scale_denom)
        dt = time.time() - t0
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        elif img.shape[-1] == 4:  # Adobe CMYK/YCCK stream
            from jpeg_tpu.ops import color as _color

            img = _color.cmyk_to_rgb(img)
        bmp.write_bmp(args.output, img)
        print(f"{args.input} -> {args.output}: {img.shape[1]}x{img.shape[0]}, "
              f"{dt*1e3:.1f} ms")
        return 0

    if args.cmd == "roundtrip":
        from jpeg_tpu.utils import metrics

        img = bmp.read_bmp(args.input)
        data = encode(
            img, quality=args.quality, subsampling=args.subsampling,
            restart_interval=args.restart_interval,
            optimize_tables=args.optimize_tables,
        )
        out = decode(data)
        print(f"quality={args.quality} subsampling={args.subsampling}: "
              f"{len(data)} bytes, "
              f"bpp={metrics.bits_per_pixel(data, img.shape):.3f}, "
              f"PSNR={metrics.psnr(out, img):.2f} dB")
        return 0

    if args.cmd == "mosaic":
        from jpeg_tpu.parallel.mesh import make_mesh
        from jpeg_tpu.parallel.mosaic import encode_mosaic, encode_mosaic_stream

        if args.stream:
            t0 = time.time()
            with bmp.BmpRowReader(args.input) as src, \
                    open(args.output, "wb") as f:
                nbytes_mp = src.height * src.width / 1e6
                encode_mosaic_stream(
                    src.rows, src.height, src.width, quality=args.quality,
                    subsampling=args.subsampling,
                    stripe_rows=args.stripe_rows,
                    optimize_tables=args.optimize_tables, out=f,
                )
            dt = time.time() - t0
            import os as _os
            print(f"{args.input} ({nbytes_mp:.1f} MPix) -> {args.output}: "
                  f"{_os.path.getsize(args.output)} bytes streamed, "
                  f"{dt*1e3:.0f} ms")
            return 0

        img = bmp.read_bmp(args.input)
        mesh = make_mesh(args.devices, batch_axis=1)
        t0 = time.time()
        data = encode_mosaic(
            img, quality=args.quality, subsampling=args.subsampling,
            mesh=mesh, optimize_tables=args.optimize_tables,
        )
        dt = time.time() - t0
        with open(args.output, "wb") as f:
            f.write(data)
        mp = img.shape[0] * img.shape[1] / 1e6
        print(f"{args.input} ({mp:.1f} MPix) -> {args.output}: {len(data)} "
              f"bytes via {mesh.shape['mcu']} stripes, {dt*1e3:.0f} ms")
        return 0

    if args.cmd == "batch":
        import os

        from jpeg_tpu.parallel.pipeline import decode_stream, encode_stream

        os.makedirs(args.outdir, exist_ok=True)
        t0 = time.time()
        mpix = 0.0

        def out_names(ext):
            # Disambiguate colliding basenames (a/x.bmp + b/x.bmp) instead
            # of silently overwriting one output with the other.
            seen: dict = {}
            names = []
            for p in args.inputs:
                base = os.path.splitext(os.path.basename(p))[0]
                n = seen.get(base, 0)
                seen[base] = n + 1
                names.append((base if n == 0 else f"{base}_{n}") + ext)
            return names

        if args.decode:
            def read_jpegs():
                for p in args.inputs:
                    with open(p, "rb") as f:
                        yield f.read()

            outs = out_names(".bmp")
            for name, img in zip(outs, decode_stream(read_jpegs(),
                                                     depth=args.depth)):
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
                elif img.shape[-1] == 4:
                    from jpeg_tpu.ops import color as _color

                    img = _color.cmyk_to_rgb(img)
                mpix += img.shape[0] * img.shape[1] / 1e6
                bmp.write_bmp(os.path.join(args.outdir, name), img)
        else:
            tally = [0.0]

            def read_all():
                # Generator: RSS stays at ~depth+1 raw frames instead of
                # materializing the whole batch before the first encode.
                for p in args.inputs:
                    img = bmp.read_bmp(p)
                    tally[0] += img.shape[0] * img.shape[1] / 1e6
                    yield img

            stream = encode_stream(
                read_all(), quality=args.quality,
                subsampling=args.subsampling, depth=args.depth,
            )
            for name, data in zip(out_names(".jpg"), stream):
                with open(os.path.join(args.outdir, name), "wb") as f:
                    f.write(data)
            mpix = tally[0]
        dt = time.time() - t0
        verb = "decoded" if args.decode else "encoded"
        print(f"{verb} {len(args.inputs)} files ({mpix:.1f} MPix) in "
              f"{dt*1e3:.0f} ms ({mpix/dt:.1f} MPix/s)")
        return 0

    if args.cmd == "info":
        from jpeg_tpu.io import jfif

        with open(args.input, "rb") as f:
            info_ = jfif.parse_jpeg(f.read())
        print(f"{info_.width}x{info_.height}, {len(info_.components)} components")
        for c in info_.components:
            print(f"  comp {c.comp_id}: sampling {c.h}x{c.v}, "
                  f"qtable {c.qtab_id}, DC/AC tables {c.dc_id}/{c.ac_id}")
        print(f"  quant tables: {sorted(info_.qtables)}")
        print(f"  huffman tables: {sorted(info_.htables)}")
        print(f"  restart interval: {info_.restart_interval}")
        print(f"  scan bytes: {len(info_.scan_data)}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
