"""Device-side (JAX/XLA/Pallas) ops for the TPU JPEG engine."""

from jpeg_tpu.ops import color, dct, dpcm, quant, subsample, tile, zigzag  # noqa: F401
