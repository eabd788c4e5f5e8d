"""Multi-chip sliding-window inference: slab sharding + halo exchange.

New architecture with no reference counterpart (the reference is
single-device; SURVEY.md section 2.3). The patch grid is distributed
over a 1-D mesh (Z rows) or a 2-D mesh (Z rows x Y rows); each device
runs the same on-device accumulate loop as single-chip ``predict`` over
its own rows, then trimmed patch outputs that spill past a slab's owned
range (``overlap - 2*trim`` planes per axis, 16 by default) ride
``jax.lax.ppermute`` to the forward neighbor and are added -- one
neighbor exchange per sharded axis over ICI, no host-side blending.

2-D corner flow: the Z exchange runs first with strips that include the
Y-tail columns, then the Y exchange forwards strips covering the full
local Z extent (owned + received head + unsent tail). A contribution
bound for the diagonal neighbor therefore arrives exactly once, via
Z-then-Y; the Y-then-Z copy lands in a Z-tail its holder discards
(only last-Z devices keep Z tails, and they have no Z neighbor that
could double-deliver).

Bit-compatibility: identical patch set, same per-patch math; f32
addition order differs only where exchanged strips merge (<= 1e-6).
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


class _AxisPlan:
    """Row partitioning of one sharded spatial axis over n mesh slots."""

    def __init__(self, starts, patch, overlap, trim, n_dev):
        self.starts = list(starts)
        self.patch = patch
        self.stride = patch - overlap
        self.spill = max(overlap - 2 * trim, 0)
        self.n_dev = n_dev
        rpd = math.ceil(len(self.starts) / n_dev)
        # Single-hop exchange: a device's spill must land inside its
        # immediate neighbor's owned extent.
        rpd = max(rpd, math.ceil(self.spill / max(self.stride, 1)))
        self.rpd = rpd
        self.slab = (rpd - 1) * self.stride + patch
        self.own = rpd * self.stride
        if self.spill > self.own:
            raise ValueError(
                f"spill {self.spill} exceeds owned extent {self.own}: "
                "overlap too large relative to stride for single-hop "
                "halo exchange"
            )

    def pad_to(self, dim):
        """Extra planes so every (padded-grid) slab gather is in-bounds."""
        return max(
            (self.n_dev * self.rpd - 1) * self.stride + self.patch - dim, 0
        )


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
    """predict() over a 1-D (Z) or 2-D (Z x Y) device mesh."""
    img = np.asarray(img)
    if img.ndim == 5:
        img = img[0, 0]
    img = np.minimum(img, brightness_clip)
    img = normalize(img, percentiles=normalization_percentiles)
    img = np.ascontiguousarray(img, dtype=np.float32)

    runner = model if isinstance(model, ModelRunner) else ModelRunner(*model)
    out_channels = 3 if affinity_mode else 1
    mesh = mesh or make_mesh()
    axes = mesh.axis_names
    if len(axes) == 1:
        nz, ny = mesh.devices.size, 1
        z_axis, y_axis = axes[0], None
    elif len(axes) == 2:
        nz, ny = mesh.devices.shape
        z_axis, y_axis = axes
    else:
        raise ValueError(f"expected a 1-D or 2-D mesh, got axes {axes}")

    dim = img.shape
    ranges = patch_grid_ranges(dim, patch_shape, overlap)
    zp = _AxisPlan(ranges[0], patch_shape[0], overlap[0], trim, nz)
    yp = _AxisPlan(ranges[1], patch_shape[1], overlap[1], trim, ny)

    # Pad with the REAL grid first (reflection anchored at each axis's
    # last patch-tail segment -- exact per-patch reference semantics,
    # shared with single-device predict), then edge-extend the sharded
    # axes out to their padded-row grids (those extra planes are only
    # reachable through invalid, masked-out rows).
    padded, _ = stitch.reflect_pad_to_grid(img, patch_shape, overlap)
    deep = (
        (0, max(dim[0] + zp.pad_to(dim[0]) - padded.shape[0], 0)),
        (0, max(dim[1] + yp.pad_to(dim[1]) - padded.shape[1], 0)),
        (0, 0),
    )
    if any(hi for _, hi in deep):
        padded = np.pad(padded, deep, mode="edge")
    wp = padded.shape[2]

    # Per-device input slabs: (nz, ny, slab_z, slab_y, wp).
    slabs = np.empty((nz, ny, zp.slab, yp.slab, wp), np.float32)
    for i in range(nz):
        for j in range(ny):
            slabs[i, j] = padded[
                i * zp.own: i * zp.own + zp.slab,
                j * yp.own: j * yp.own + yp.slab,
            ]

    # Per-device starts (slab-local) + validity masks.
    xs = list(ranges[2])
    per_dev = zp.rpd * yp.rpd * len(xs)
    pad_n = (-per_dev) % batch_size
    n_local = per_dev + pad_n
    starts = np.zeros((nz, ny, n_local, 3), np.int32)
    valid = np.zeros((nz, ny, n_local), np.float32)
    for i in range(nz):
        for j in range(ny):
            k = 0
            for rz in range(zp.rpd):
                for ry in range(yp.rpd):
                    for x in xs:
                        starts[i, j, k] = (rz * zp.stride, ry * yp.stride, x)
                        ok = (
                            i * zp.rpd + rz < len(zp.starts)
                            and j * yp.rpd + ry < len(yp.starts)
                        )
                        valid[i, j, k] = 1.0 if ok else 0.0
                        k += 1

    # Per-slot weight slices over the kept (own + spill) windows.
    wz, wy, wx = stitch.separable_weights(dim, patch_shape, overlap, trim)

    def shard_weights(w, plan):
        ext = np.concatenate([
            w,
            np.zeros(plan.n_dev * plan.own + plan.spill + plan.patch,
                     np.float32),
        ])
        return np.stack([
            ext[d * plan.own + trim:
                d * plan.own + trim + plan.own + plan.spill]
            for d in range(plan.n_dev)
        ])

    wz_shards = shard_weights(wz, zp)  # (nz, own_z + spill_z)
    wy_shards = shard_weights(wy, yp)  # (ny, own_y + spill_y)
    wx_pad = np.concatenate([wx, np.zeros(wp - len(wx), np.float32)])

    module = runner.module
    ps = tuple(patch_shape)
    mesh_axes = tuple(a for a in (z_axis, y_axis) if a)

    def body(variables, slab, starts_l, valid_l, wz_l, wy_l, wx_l):
        slab = slab.reshape(slab.shape[-3:])
        starts_l = starts_l.reshape(starts_l.shape[-2:])
        valid_l = valid_l.reshape(valid_l.shape[-1:])
        wz_l = wz_l.reshape(wz_l.shape[-1:])
        wy_l = wy_l.reshape(wy_l.shape[-1:])
        acc = stitch.accumulate_core(
            variables, slab, starts_l, valid_l, module=module,
            patch_shape=ps, trim=trim, batch_size=batch_size,
            out_channels=out_channels, vma_axes=mesh_axes,
        )
        keep_z = zp.own + zp.spill
        keep_y = yp.own + yp.spill
        mine = jax.lax.dynamic_slice(
            acc, (0, trim, trim, 0), (out_channels, keep_z, keep_y, wp)
        )
        # Phase Z: forward the z-tail, Y-tail columns included.
        if zp.spill > 0 and nz > 1:
            strip = mine[:, zp.own: keep_z]
            recv = jax.lax.ppermute(
                strip, z_axis, [(i, i + 1) for i in range(nz - 1)]
            )
            mine = mine.at[:, : zp.spill].add(recv)
        # Phase Y: forward the y-tail over the FULL local z extent.
        if y_axis is not None and yp.spill > 0 and ny > 1:
            strip = mine[:, :, yp.own: keep_y]
            recv = jax.lax.ppermute(
                strip, y_axis, [(j, j + 1) for j in range(ny - 1)]
            )
            mine = mine.at[:, :, : yp.spill].add(recv)
        w = wz_l[:, None, None] * wy_l[None, :, None] * wx_l[None, None, :]
        blended = jnp.where(w > 0, mine / jnp.where(w > 0, w, 1.0), 0.0)
        return blended.reshape((1,) * len(mesh_axes) + blended.shape)

    if y_axis is None:
        sharded2 = P(z_axis)  # leading (nz,) dims on 1-D mesh inputs
        wz_spec = P(z_axis)
        wy_spec = P()
        out_spec = P(z_axis)
    else:
        sharded2 = P(z_axis, y_axis)
        wz_spec = P(z_axis)
        wy_spec = P(y_axis)
        out_spec = P(z_axis, y_axis)
    spec_in = (P(), sharded2, sharded2, sharded2, wz_spec, wy_spec, P())
    fn = jax.jit(
        shard_map(body, mesh=mesh, in_specs=spec_in, out_specs=out_spec)
    )

    def put(arr, spec):
        return jax.device_put(arr, NamedSharding(mesh, spec))

    if y_axis is None:  # drop the ny=1 axis: 1-D mesh shards 1-D stacks
        slabs, starts, valid = slabs[:, 0], starts[:, 0], valid[:, 0]

    out_shards = fn(
        runner.variables,
        put(slabs, sharded2),
        put(starts, sharded2),
        put(valid, sharded2),
        put(wz_shards, wz_spec),
        put(wy_shards, wy_spec),
        jnp.asarray(wx_pad),
    )
    out_shards = np.asarray(out_shards)
    if y_axis is None:
        out_shards = out_shards[:, None]
    # (nz, ny, C, own_z + spill_z, own_y + spill_y, wp)

    # Host assembly: each slot owns [base, base + own); the last real
    # slot along each axis also keeps its unsent spill (the grid's tail).
    out = np.zeros((out_channels,) + dim, np.float32)
    for i in range(nz):
        z_base = i * zp.own + trim
        if z_base >= dim[0]:
            break
        last_z = i == nz - 1 or (i + 1) * zp.own + trim >= dim[0]
        z_hi = min(z_base + zp.own + (zp.spill if last_z else 0), dim[0])
        for j in range(ny):
            y_base = j * yp.own + trim
            if y_base >= dim[1]:
                break
            last_y = j == ny - 1 or (j + 1) * yp.own + trim >= dim[1]
            y_hi = min(y_base + yp.own + (yp.spill if last_y else 0), dim[1])
            out[:, z_base:z_hi, y_base:y_hi] = out_shards[
                i, j, :, : z_hi - z_base, : y_hi - y_base, : dim[2]
            ]
            if last_y:
                break
        if last_z:
            break
    return out if affinity_mode else out[0]
