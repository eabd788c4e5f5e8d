"""Device mesh construction helpers.

The reference is single-device (SURVEY.md section 2.3); every multi-chip
capability here is new architecture: a 1-D ``jax.sharding.Mesh`` whose
axis shards either the patch grid's Z rows (inference) or the batch
(training), with collectives riding ICI.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    return NamedSharding(mesh, P())


def sharded_first_axis(mesh, axis_name="shard"):
    return NamedSharding(mesh, P(axis_name))
