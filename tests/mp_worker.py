"""Worker process for tests/test_multiprocess.py.

Runs as one of N jax.distributed processes on localhost (CPU backend, 4
virtual devices each) and executes the sharded encode paths over the global
(2, 4) mesh — the real multi-process exercise of parallel.mesh
.make_multihost_mesh that single-process virtual meshes cannot give
(process-boundary device order, cross-host gathers).

Usage: python tests/mp_worker.py <coordinator> <num_procs> <proc_id> <outdir>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
try:  # cross-process CPU collectives need the gloo backend where available
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import numpy as np  # noqa: E402


def main() -> None:
    coord, nprocs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nprocs, jax.device_count()

    from jpeg_tpu.parallel.batch import decode_batch, encode_batch
    from jpeg_tpu.parallel.mesh import make_multihost_mesh
    from jpeg_tpu.parallel.mosaic import encode_mosaic

    mesh = make_multihost_mesh(batch_axis=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "batch": 2, "mcu": 4,
    }

    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, size=(4, 64, 48, 3)).astype(np.uint8)
    jpgs = encode_batch(imgs, quality=75, mesh=mesh)

    big = rng.integers(0, 256, size=(256, 80, 3)).astype(np.uint8)
    mos = encode_mosaic(big, quality=80, mesh=make_multihost_mesh(batch_axis=1))

    px = decode_batch(jpgs, mesh=mesh)

    if pid == 0:
        import pathlib

        out = pathlib.Path(outdir)
        for i, j in enumerate(jpgs):
            (out / f"img{i}.jpg").write_bytes(j)
        (out / "mosaic.jpg").write_bytes(mos)
        np.save(out / "decoded.npy", px)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
