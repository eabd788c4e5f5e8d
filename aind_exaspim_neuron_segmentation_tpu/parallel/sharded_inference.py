"""Multi-chip sliding-window inference: Z-slab sharding + halo exchange.

New architecture with no reference counterpart (the reference is
single-device; SURVEY.md section 2.3). The patch grid's Z rows are
distributed round-robin-contiguously over a 1-D mesh; each device runs
the same on-device accumulate loop as single-chip ``predict`` over its
own rows, then the trimmed patch outputs that spill past a slab's owned
range (``overlap - 2*trim`` planes, 16 by default) are sent to the next
device with ``jax.lax.ppermute`` and added -- one neighbor exchange over
ICI per volume instead of any host-side blending. Division by the
analytic blend-weight map happens on-device per shard.

Bit-compatibility: identical patch set, same per-patch math, accumulation
order differs only in float32 addition order (<= 1e-6).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from aind_exaspim_neuron_segmentation_tpu.core.normalize import (
    DEFAULT_PERCENTILES,
    normalize,
)
from aind_exaspim_neuron_segmentation_tpu.core.patches import (
    patch_grid_ranges,
)
from aind_exaspim_neuron_segmentation_tpu.inference import ModelRunner
from aind_exaspim_neuron_segmentation_tpu.ops import stitch
from aind_exaspim_neuron_segmentation_tpu.parallel.mesh import make_mesh


def predict_sharded(
    img,
    model,
    mesh=None,
    affinity_mode=True,
    batch_size=16,
    brightness_clip=1000,
    normalization_percentiles=DEFAULT_PERCENTILES,
    patch_shape=(96, 96, 96),
    overlap=(32, 32, 32),
    trim=8,
):
    """predict() over a device mesh (same numerics, sharded Z rows)."""
    img = np.asarray(img)
    if img.ndim == 5:
        img = img[0, 0]
    img = np.minimum(img, brightness_clip)
    img = normalize(img, percentiles=normalization_percentiles)
    img = np.ascontiguousarray(img, dtype=np.float32)

    runner = model if isinstance(model, ModelRunner) else ModelRunner(*model)
    out_channels = 3 if affinity_mode else 1
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    dim = img.shape
    ranges = patch_grid_ranges(dim, patch_shape, overlap)
    z_starts = list(ranges[0])
    stride = patch_shape[0] - overlap[0]
    spill = max(overlap[0] - 2 * trim, 0)
    n_rows = len(z_starts)
    rpd = math.ceil(n_rows / n_dev)  # rows per device
    # The halo exchange is single-hop: a device's spill must land inside
    # its immediate neighbor's owned range. Bump rows-per-device until
    # own_d = rpd*stride >= spill (narrow-stride grids on wide meshes).
    if stride > 0:
        rpd = max(rpd, math.ceil(spill / stride))
    slab_d = (rpd - 1) * stride + patch_shape[0]
    own_d = rpd * stride
    if spill > own_d:
        raise ValueError(
            f"spill {spill} exceeds owned depth {own_d}: overlap too "
            "large relative to stride for single-hop halo exchange"
        )

    # Grid-pad so every slab/patch gather is in-bounds. Y/X reflect to the
    # grid extent (same as single-device); Z pads to the padded-row grid:
    # reflect up to dim-1 planes (matching per-patch reflect), edge-pad
    # any deeper overhang (only reachable by all-invalid padding rows).
    pad_z = max((n_dev * rpd - 1) * stride + patch_shape[0] - dim[0], 0)
    pad_y = max(ranges[1][-1] + patch_shape[1] - dim[1], 0)
    pad_x = max(ranges[2][-1] + patch_shape[2] - dim[2], 0)
    reflect_z = min(pad_z, dim[0] - 1)
    padded = np.pad(
        img, ((0, reflect_z), (0, pad_y), (0, pad_x)), mode="reflect"
    )
    if reflect_z < pad_z:
        padded = np.pad(
            padded, ((0, pad_z - reflect_z), (0, 0), (0, 0)), mode="edge"
        )
    hp, wp = padded.shape[1:]

    # Per-device input slabs (overlapping views, stacked).
    slabs = np.stack([
        padded[d * own_d: d * own_d + slab_d] for d in range(n_dev)
    ])

    # Per-device starts (slab-local) + validity.
    yx = [(y, x) for y in ranges[1] for x in ranges[2]]
    per_dev = rpd * len(yx)
    pad_n = (-per_dev) % batch_size
    n_local = per_dev + pad_n
    starts = np.zeros((n_dev, n_local, 3), np.int32)
    valid = np.zeros((n_dev, n_local), np.float32)
    for d in range(n_dev):
        k = 0
        for r in range(rpd):
            row = d * rpd + r
            for (y, x) in yx:
                starts[d, k] = (r * stride, y, x)
                valid[d, k] = 1.0 if row < n_rows else 0.0
                k += 1

    # Per-device weight slices over [own_lo, own_lo + own_d + spill).
    wz, wy, wx = stitch.separable_weights(dim, patch_shape, overlap, trim)
    wz_ext = np.concatenate([wz, np.zeros(n_dev * own_d + spill, np.float32)])
    wz_shards = np.stack([
        wz_ext[d * own_d + trim: d * own_d + trim + own_d + spill]
        for d in range(n_dev)
    ])

    module = runner.module
    ps = tuple(patch_shape)

    def body(variables, slab, starts_l, valid_l, wz_l, wy_l, wx_l):
        slab = slab[0]  # strip the sharded leading axis
        starts_l = starts_l[0]
        valid_l = valid_l[0]
        wz_l = wz_l[0]
        acc = stitch.accumulate_core(
            variables, slab, starts_l, valid_l, module=module,
            patch_shape=ps, trim=trim, batch_size=batch_size,
            out_channels=out_channels, vma_axes=(axis,),
        )
        # Own + spill planes, local z in [trim, trim + own_d + spill).
        mine = jax.lax.dynamic_slice(
            acc, (0, trim, 0, 0),
            (out_channels, own_d + spill, hp, wp),
        )
        # Send my tail strip forward; receive predecessor's into my head
        # (non-cyclic ppermute: device 0 receives zeros).
        if spill > 0 and n_dev > 1:
            strip = mine[:, own_d: own_d + spill]
            recv = jax.lax.ppermute(
                strip, axis, [(i, i + 1) for i in range(n_dev - 1)]
            )
            mine = mine.at[:, :spill].add(recv)
        w = wz_l[:, None, None] * wy_l[None, :, None] * wx_l[None, None, :]
        blended = jnp.where(w > 0, mine / jnp.where(w > 0, w, 1.0), 0.0)
        return blended[None]

    spec_in = (
        P(),  # variables replicated
        P(axis), P(axis), P(axis), P(axis), P(), P(),
    )
    fn = jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=spec_in, out_specs=P(axis),
        )
    )
    wy_pad = np.concatenate([wy, np.zeros(hp - len(wy), np.float32)])
    wx_pad = np.concatenate([wx, np.zeros(wp - len(wx), np.float32)])
    out_shards = fn(
        runner.variables,
        jax.device_put(slabs, NamedSharding(mesh, P(axis))),
        jax.device_put(starts, NamedSharding(mesh, P(axis))),
        jax.device_put(valid, NamedSharding(mesh, P(axis))),
        jax.device_put(wz_shards, NamedSharding(mesh, P(axis))),
        jnp.asarray(wy_pad),
        jnp.asarray(wx_pad),
    )
    out_shards = np.asarray(out_shards)  # (n_dev, C, own_d+spill, hp, wp)

    out = np.zeros((out_channels,) + dim, np.float32)
    for d in range(n_dev):
        lo = d * own_d + trim
        if lo >= dim[0]:
            break
        hi = min(lo + own_d, dim[0])
        out[:, lo:hi] = out_shards[d, :, : hi - lo, : dim[1], : dim[2]]
        # The final device's unsent spill covers the grid's tail planes.
        is_last = d == n_dev - 1 or (d + 1) * own_d + trim >= dim[0]
        if is_last and hi < dim[0]:
            tail_hi = min(hi + spill, dim[0])
            out[:, hi:tail_hi] = out_shards[
                d, :, own_d: own_d + tail_hi - hi, : dim[1], : dim[2]
            ]
            break
    return out if affinity_mode else out[0]
