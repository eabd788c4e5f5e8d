"""Multi-chip / multi-host inference example.

Demonstrates the TPU-mesh path end to end: a blosc-compressed Zarr
volume streams shard-by-shard through ``parallel.predict_sharded`` on a
1-D or 2-D device mesh, normalized by exact mesh-wide order statistics,
with the result streamed into a Zarr store. Works anywhere: on a
machine without 8 devices it forces an 8-device virtual CPU mesh.

On a real multi-host TPU pod, launch one process per host; the
``initialize_distributed()`` call (no-op here) wires the DCN runtime so
each process reads and writes only its own shards.

Usage::

    python examples/run_multichip.py [output_dir]
"""

import os
import sys

# Allow running straight from a source checkout (python examples/...).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_devices(n=8):
    if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    if jax.device_count() >= n:
        return jax  # a real mesh (TPU pod slice) is available
    # fall back to an n-device virtual CPU mesh; the device query above
    # already initialized a backend, so drop it before re-configuring
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", n)
    except RuntimeError:
        from jax.extend import backend as _backend

        _backend.clear_backends()
        jax.config.update("jax_num_cpu_devices", n)
    return jax


def main(out_dir="./multichip_out"):
    import numpy as np

    jax = ensure_devices(8)

    from aind_exaspim_neuron_segmentation_tpu import inference, parallel
    from aind_exaspim_neuron_segmentation_tpu.io import read, zarr_lite
    from aind_exaspim_neuron_segmentation_tpu.parallel.mesh import (
        initialize_distributed,
    )

    os.makedirs(out_dir, exist_ok=True)
    initialize_distributed()  # no-op single-process; DCN init on a pod

    # A blosc-compressed input store (the AIND production default).
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 1500, (96, 64, 48)).astype(np.uint16)
    in_path = os.path.join(out_dir, "input.zarr")
    zarr_lite.write_zarr(
        in_path, vol, chunks=(32, 32, 32),
        compressor={"id": "blosc", "cname": "lz4", "clevel": 5,
                    "shuffle": 1},
    )

    runner = inference.load_model(width_multiplier=0.25)
    kw = dict(patch_shape=(32, 32, 32), overlap=(8, 8, 8), trim=2,
              batch_size=4)

    # 1-D Z-sharded, lazy in, zarr out.
    out_path = os.path.join(out_dir, "affinities.zarr")
    aff = parallel.predict_sharded(
        read(in_path), runner, mesh=parallel.make_mesh(8),
        out_path=out_path, **kw,
    )
    print(f"1-D mesh -> {out_path}: shape {aff.shape}")

    # 2-D (Z x Y) mesh with gaussian blending, banded for bounded HBM.
    aff2 = parallel.predict_sharded(
        read(in_path), runner, mesh=parallel.make_mesh_2d((4, 2)),
        blend_mode="gaussian", max_band_rows=2, **kw,
    )
    print(f"2-D mesh (banded, gaussian): dense result {aff2.shape}")

    # Production volume->segmentation path: every device digests its
    # own blended region on-chip, so only 4 bytes/voxel are fetched
    # and the host watershed replays pure integer work.
    plan, qaff = parallel.predict_sharded(
        read(in_path), runner, mesh=parallel.make_mesh_2d((4, 2)),
        predigest=True, **kw,
    )
    seg = inference.affinities_to_segmentation((plan, qaff))
    print(f"predigest -> segmentation: {seg.shape}, {seg.max()} segments")

    # Both float paths agree with single-device predict.
    want = inference.predict(vol, runner, verbose=False, **kw)
    got = np.asarray(aff[:])
    print("1-D vs single-device max |diff|:",
          float(np.abs(got - want).max()))
    del jax


if __name__ == "__main__":
    main(*sys.argv[1:2])
