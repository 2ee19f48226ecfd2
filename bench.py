"""Benchmark driver: end-to-end 4K encode throughput at q=75, 4:2:0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's measured 0.20 MPix/s single-core working-pipeline
rate (BASELINE.md — its DCT alone; it cannot finish an encode at all).

Runs on whatever platform JAX selects (the real TPU chip under the driver);
extra diagnostics go to stderr so stdout stays a single JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MPIX_S = 0.20  # reference, 1 CPU core (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 128 / (h + w)], axis=-1
    )
    noise = rng.integers(-10, 11, size=(h, w, 3))
    return np.clip(grad + noise, 0, 255).astype(np.uint8)


def main():
    import jax

    t0 = time.time()
    devices = jax.devices()
    log(f"devices: {devices} (init {time.time()-t0:.1f}s)")

    from jpeg_tpu import decode, encode

    h, w = 2160, 3840  # 4K
    img = make_image(h, w)
    mpix = h * w / 1e6

    # Warmup: trace + compile + first transfer.
    t0 = time.time()
    jpg = encode(img, quality=75, subsampling="420")
    log(f"warmup encode: {time.time()-t0:.2f}s, {len(jpg)} bytes")

    # Timed encode.
    n = 3
    t0 = time.time()
    for _ in range(n):
        jpg = encode(img, quality=75, subsampling="420")
    enc_s = (time.time() - t0) / n
    enc_rate = mpix / enc_s
    log(f"encode: {enc_s*1e3:.1f} ms -> {enc_rate:.1f} MPix/s")

    # Decode (ours) for the record.
    t0 = time.time()
    out = decode(jpg)
    dec_s = time.time() - t0
    log(f"decode: {dec_s*1e3:.1f} ms -> {mpix/dec_s:.1f} MPix/s")
    assert out.shape == img.shape

    print(
        json.dumps(
            {
                "metric": "4K encode q75 4:2:0 (device transform + entropy + JFIF)",
                "value": round(enc_rate, 2),
                "unit": "MPix/s",
                "vs_baseline": round(enc_rate / BASELINE_MPIX_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
