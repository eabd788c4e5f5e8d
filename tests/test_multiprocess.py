"""True multi-process (2 hosts x 4 devices) sharded-inference test.

Launches two REAL processes joined through jax.distributed over a
localhost coordinator -- the same runtime path a multi-host TPU pod
uses (SURVEY §5 scale-out bullet) -- and runs ``predict_sharded`` with
``out_path``: each process loads only the slabs its devices hold and
writes only its own Z rows through ``ZarrPlaneWriter`` (no
coordination). The parent verifies the jointly-written store against
single-device ``predict``.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu import inference
from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite

_WORKER = """
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
in_path, out_path = sys.argv[3], sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=pid, local_device_ids=list(range(4)),
)
assert jax.process_count() == 2 and len(jax.devices()) == 8
from aind_exaspim_neuron_segmentation_tpu import inference, parallel
from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite

runner = inference.load_model(
    affinity_mode=True, width_multiplier=0.25, dtype="float32"
)
lazy = zarr_lite.open_zarr(in_path)
parallel.predict_sharded(
    lazy, runner, mesh=parallel.make_mesh(8),
    patch_shape=(16, 16, 16), overlap=(8, 8, 4), trim=2, batch_size=4,
    out_path=out_path,
)
print(f"[p{pid}] done", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_predict(tmp_path):
    rng = np.random.default_rng(7)
    vol = rng.integers(0, 1500, (48, 44, 20)).astype(np.uint16)
    in_path = str(tmp_path / "in.zarr")
    zarr_lite.write_zarr(in_path, vol, chunks=(16, 16, 20))
    out_path = str(tmp_path / "out.zarr")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    )
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), port, in_path,
             out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-3000:]

    runner = inference.load_model(
        affinity_mode=True, width_multiplier=0.25, dtype=np.float32
    )
    want = inference.predict(
        vol, runner, patch_shape=(16, 16, 16), overlap=(8, 8, 4),
        trim=2, batch_size=4, verbose=False,
    )
    got = np.asarray(zarr_lite.open_zarr(out_path)[:])
    np.testing.assert_allclose(got, want, atol=1e-6)
