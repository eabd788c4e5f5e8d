"""Device mesh construction helpers.

The reference is single-device (SURVEY.md section 2.3); every multi-chip
capability here is new architecture: a 1-D ``jax.sharding.Mesh`` whose
axis shards either the patch grid's Z rows (inference) or the batch
(training), with collectives riding ICI.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, **kwargs):
    """Multi-process (DCN) runtime init -- SURVEY §5 scale-out bullet.

    Thin wrapper over ``jax.distributed.initialize`` that is safe to
    call unconditionally: single-process runs (no coordinator address
    given or discoverable from the standard env vars) return without
    touching the runtime, and a second call on an initialized runtime is
    a no-op. After it runs, ``jax.devices()`` spans every host's chips,
    so :func:`make_mesh` / :func:`make_mesh_2d` build global meshes and
    ``predict_sharded`` / ``Trainer(mesh=)`` scale across hosts with the
    same code path (XLA routes same-slice collectives over ICI and
    cross-slice over DCN).

    Returns True when a multi-process runtime is (already) initialized.
    """
    env = os.environ
    coordinator_address = (
        coordinator_address
        or env.get("JAX_COORDINATOR_ADDRESS")
        or env.get("COORDINATOR_ADDRESS")
    )
    # The CLI --distributed contract (README / --help): process
    # geometry via env when not passed explicitly. jax.distributed
    # does NOT read these names itself (only cluster autodetect like
    # SLURM), so without this the documented env-driven launch raised
    # 'Number of processes must be defined'.
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    # TPU pod auto-detect: only when the worker list names MULTIPLE
    # hosts (single-host TPU VMs also export TPU_WORKER_HOSTNAMES).
    workers = [
        h for h in env.get("TPU_WORKER_HOSTNAMES", "").split(",") if h
    ]
    auto_tpu = len(workers) > 1 or env.get("MEGASCALE_COORDINATOR_ADDRESS")
    # ORDERING MATTERS: jax.distributed.initialize must run before
    # anything that initializes the XLA backend, and jax.process_count()
    # does exactly that -- probing it first would make every real
    # multi-process init raise. is_initialized() only reads the
    # distributed global state.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1  # already initialized
    if coordinator_address is None and not auto_tpu:
        return False  # single-process run: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return jax.process_count() > 1


def make_mesh(n_devices=None, axis_name="shard", devices=None):
    """1-D mesh over the first ``n_devices`` available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices, have {len(devices)}; on CPU set "
            "XLA_FLAGS=--xla_force_host_platform_device_count"
        )
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def make_mesh_2d(shape, axis_names=("z", "y"), devices=None):
    """2-D mesh (e.g. Z x Y slab sharding for ``predict_sharded``)."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices, have {len(devices)}; on CPU set "
            "XLA_FLAGS=--xla_force_host_platform_device_count"
        )
    return Mesh(np.asarray(devices[:n]).reshape(shape), tuple(axis_names))


def replicated(mesh):
    """Fully replicated NamedSharding on ``mesh``."""
    return NamedSharding(mesh, P())


def sharded_first_axis(mesh, axis_name="shard"):
    """NamedSharding splitting the leading array axis over ``axis_name``."""
    return NamedSharding(mesh, P(axis_name))
