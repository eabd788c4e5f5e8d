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

Feature parity with single-device ``predict``:

* **Lazy inputs stream per shard** -- each device's slab is sliced from
  the (zarr/N5) source through a precomputed pad index map and shipped
  with ``jax.make_array_from_single_device_arrays``; at most one slab
  is ever dense on the host.
* **Normalization runs on device**: brightness clip at slab load, then
  exact global percentiles over the mesh via masked radix order stats
  (:func:`parallel.stats.order_stats_sharded`, one ``psum`` histogram
  per round) with np.percentile's float64 linear interpolation on the
  two fetched scalars -- no host pass over the volume.
* **Gaussian blend** (``blend_mode='gaussian'``) matches ``predict``.
* **Streaming output**: with ``out_path`` each Z row of shards is
  fetched and appended to a Zarr store as it completes; host memory
  stays O(one Z row).

Bit-compatibility: identical patch set, same per-patch math; f32
addition order differs only where exchanged strips merge, and the
device-side normalization scales in f32 (the host path rounds a f64
product) -- both <= 1e-6 (tests/test_parallel.py).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from aind_exaspim_neuron_segmentation_tpu.core.normalize import (
    DEFAULT_PERCENTILES,
)
from aind_exaspim_neuron_segmentation_tpu.core.patches import (
    patch_grid_ranges,
)
from aind_exaspim_neuron_segmentation_tpu.inference import ModelRunner
from aind_exaspim_neuron_segmentation_tpu.ops import stitch
from aind_exaspim_neuron_segmentation_tpu.parallel import stats
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

    def padded_len(self, dim):
        """Axis length covering every slab gather (grid + deep padding)."""
        return max((self.n_dev * self.rpd - 1) * self.stride + self.patch,
                   dim)


def _axis_pad_map(dim, patch, starts, total_len):
    """Index map padded-position -> source plane for one axis.

    Replicates :func:`ops.stitch.reflect_pad_to_grid` (reflection
    anchored at the LAST patch's tail segment, multi-bounce included)
    followed by edge extension out to ``total_len`` -- as an index map,
    so lazy sources can be sliced per shard instead of padded densely.
    """
    idx = np.arange(dim)
    pad = max(starts[-1] + patch - dim, 0)
    if pad > 0:
        tail = idx[starts[-1]:]
        ext = np.pad(tail, (0, pad), mode="reflect")
        idx = np.concatenate([idx, ext[dim - starts[-1]:]])
    if total_len > len(idx):
        idx = np.pad(idx, (0, total_len - len(idx)), mode="edge")
    return idx[:total_len]


def _auto_band_rows(n_rows, nz, stride_z, patch_z, plane_bytes,
                    budget=4 * 1024**3):
    """Largest Z-row count whose per-device slab + accumulator fit the
    HBM ``budget`` (input f32 + 3-channel f32 accumulator per plane).

    Returns ``None`` when every row fits in one band (the common case,
    which keeps mesh-order-statistics normalization).
    """
    per_dev_z_budget = budget // max(plane_bytes, 1)
    rpd = max(int((per_dev_z_budget - patch_z) // max(stride_z, 1)), 1)
    rows = rpd * nz
    return None if rows >= n_rows else rows


def _ysplit_chunk_grid(trim, own, dim):
    """(cy, cx) store chunk grid for Y-split multi-process writes.

    Chunk height must divide every Y shard boundary (``trim + j*own``)
    so the processes sharing a Z row touch disjoint chunk keys;
    ``gcd(trim, own)`` does (halved down to <=256 for sane objects).
    A degenerate gcd (coprime trim/own -> cy=1) stays CORRECT but
    explodes the store into per-row chunks, so warn with the object
    count and the knobs that fix it (advisor round-4 finding).
    """
    g = math.gcd(trim, own) if trim else own
    while g > 256 and g % 2 == 0:
        g //= 2
    if g < 8:
        import warnings

        n_chunks = dim[0] * -(-dim[1] // g) * -(-dim[2] // 256)
        warnings.warn(
            f"Y-split output chunk height gcd(trim={trim}, own={own})"
            f" = {g} is degenerate: the store would need ~{n_chunks} "
            "chunk objects. Pick patch/overlap/trim so the per-device "
            "Y extent shares a factor >= 8 with trim, use a Z-only "
            "mesh, or pass allow_partial=True.",
            RuntimeWarning, stacklevel=3,
        )
    return (g, min(256, dim[2]))


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
    blend_mode="uniform",
    blend_sigma=None,
    out_path=None,
    max_band_rows=None,
    timer=None,
    allow_partial=False,
    predigest=False,
):
    """predict() over a 1-D (Z) or 2-D (Z x Y) device mesh.

    ``img`` may be a dense array or any lazy chunked reader
    (``io.zarr_lite.LazyArray``); lazy sources are never densified.
    ``out_path`` streams the result into a Zarr store row-by-row and
    returns a lazy handle instead of an ndarray.

    ``max_band_rows``: the Z patch rows are processed in bands of at
    most this many rows -- the mesh-wide analogue of ``predict``'s
    ``max_slab_rows``. Default ``None`` auto-sizes: one band whenever
    the per-device slab + accumulator fit a ~4 GiB HBM budget (the
    common case), else the largest band that does. Pass ``0`` to force
    a single band regardless. Each band runs the full sharded
    kernel (one compile, reused: every band is padded to the same slab
    geometry) and boundary rows are recomputed by the next band, so
    device HBM holds only one band's slabs and accumulators at a time.
    Volumes larger than the mesh's combined HBM stream through;
    normalization switches from mesh order statistics to the exact
    host-streaming radix percentile (same values to f32 rounding).

    ``allow_partial``: multi-process only. Without ``out_path`` each
    process can only fill the output rows its own devices hold, so the
    dense return is process-local (zeros elsewhere); that call is
    refused unless ``allow_partial=True`` makes the contract explicit.
    With it, 2-D meshes may also split a Z row's Y shards across
    processes (each fills its own Y ranges). ``out_path`` streaming
    supports Y-split rows too: the store's Y chunk grid is aligned to
    the shard boundaries (``cy = gcd(trim, own)``) so processes write
    disjoint chunk keys with no coordination.

    ``timer``: optional :class:`..utils.profiling.StageTimer` recording
    wall time per stage (``normalize`` / ``forward`` / ``fetch_assemble``).
    ``forward`` covers jit dispatch; under an async-dispatch transport
    (the axon dev tunnel) device completion folds into
    ``fetch_assemble``, whose host materialization is the only reliable
    completion point.

    ``predigest``: every device digests its own final blended region
    on-chip (:func:`..ops.predigest.predigest_shard`; incoming-edge
    halos ride one extra single-plane ``ppermute`` per sharded axis)
    and the call returns ``(plan, qaff)`` uint8 arrays for
    ``inference.affinities_to_segmentation`` -- 4 bytes/voxel cross
    the PCIe/DCN boundary instead of 12, and the host watershed
    replays pure integer work. Requires ``affinity_mode`` and a
    single band (for beyond-HBM volumes stream f32 to a single
    ``out_path`` and feed the lazy handle to
    ``affinities_to_segmentation``, which digests slab-wise). With
    ``out_path=(plan_path, qaff_path)`` the digests stream into two
    u8 Zarr stores (process-disjoint rows on multi-process meshes)
    and the returned pair is lazy handles that
    ``affinities_to_segmentation`` consumes directly. Digesting the
    assembled float output of the same sharded run gives bit-identical
    bytes.
    """
    import contextlib

    def _st(name):
        return (timer.stage(name) if timer is not None
                else contextlib.nullcontext())

    lazy = not isinstance(img, (np.ndarray, jnp.ndarray, list, tuple))
    if not lazy:
        img = np.asarray(img)
    if getattr(img, "ndim", 0) == 5:
        if lazy:
            from aind_exaspim_neuron_segmentation_tpu.inference import (
                _Volume5DView,
            )

            img = _Volume5DView(img)
        else:
            img = img[0, 0]
    if img.ndim != 3:
        raise ValueError(f"expected 3D or 5D input, got shape {img.shape}")

    runner = model if isinstance(model, ModelRunner) else ModelRunner(*model)
    out_channels = 3 if affinity_mode else 1
    if runner.output_channels != out_channels:
        # Same guard as single-device predict (inference.py): without
        # it a 1-channel mask model under affinity_mode=True would
        # silently broadcast into all 3 accumulator channels.
        raise ValueError(
            f"model has {runner.output_channels} output channels, "
            f"affinity_mode={affinity_mode} needs {out_channels}"
        )
    if predigest:
        if not affinity_mode:
            raise ValueError("predigest=True requires affinity_mode=True")
        if out_path is not None and (
            not isinstance(out_path, (tuple, list)) or len(out_path) != 2
        ):
            raise ValueError(
                "predigest streams TWO stores; pass "
                "out_path=(plan_path, qaff_path) -- or stream f32 with a "
                "single out_path and digest the lazy handle via "
                "affinities_to_segmentation"
            )
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
    if any(len(r) == 0 for r in ranges):
        # An axis shorter than the overlap yields an empty grid: the
        # reference's patch loop never runs and returns zeros.
        if predigest:
            plan = np.zeros(tuple(dim), np.uint8)
            qaff = np.zeros((3,) + tuple(dim), np.uint8)
            if out_path is not None:
                from aind_exaspim_neuron_segmentation_tpu.io import read
                from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite \
                    import write_zarr

                write_zarr(out_path[0], plan)
                write_zarr(out_path[1], qaff)
                return read(out_path[0]), read(out_path[1])
            return plan, qaff
        out = np.zeros((out_channels,) + tuple(dim), np.float32)
        out = out if affinity_mode else out[0]
        if out_path is not None:
            from aind_exaspim_neuron_segmentation_tpu.io import read
            from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
                write_zarr,
            )

            write_zarr(out_path, out)
            return read(out_path)
        return out
    # --- Band plan over Z patch rows -----------------------------------
    # Bands reuse single-device predict's slab planner: each band owns
    # [own_lo, own_hi) of the output and recomputes the previous band's
    # trailing rows whose trimmed output reaches into its range.
    z_starts_all = list(ranges[0])
    n_rows_all = len(z_starts_all)
    # Y partitioning is band-independent; build it first so the band
    # budget can use the PER-DEVICE Y slab. Sizing from the full dim[1]
    # on a 2-D mesh overestimated per-device memory ~ny-fold, splitting
    # bands (and downgrading normalization to the host streaming pass,
    # or refusing predigest) when a single band actually fit.
    yp = _AxisPlan(ranges[1], patch_shape[1], overlap[1], trim, ny)
    if max_band_rows is None:
        plane_bytes = 4 * (1 + out_channels) * yp.slab * max(
            dim[2], ranges[2][-1] + patch_shape[2]
        )
        max_band_rows = _auto_band_rows(
            n_rows_all, nz, patch_shape[0] - overlap[0], patch_shape[0],
            plane_bytes,
        )
    if not max_band_rows or max_band_rows >= n_rows_all:
        band_plans = [dict(
            rows=list(range(n_rows_all)), own=(0, dim[0]),
            in_range=(z_starts_all[0], z_starts_all[-1] + patch_shape[0]),
        )]
    else:
        from aind_exaspim_neuron_segmentation_tpu.inference import (
            _slab_plan,
        )

        band_plans = _slab_plan(
            z_starts_all, patch_shape[0], trim, dim[0], max_band_rows
        )
    banded = len(band_plans) > 1
    if predigest and banded:
        raise ValueError(
            "predigest=True needs a single band (the digest's -z halo "
            "is exchanged on device, not across bands); pass "
            "max_band_rows=0 if HBM allows, or stream f32 with "
            "out_path= and digest the lazy handle via "
            "affinities_to_segmentation"
        )
    max_band_nrows = max(len(p["rows"]) for p in band_plans)

    # Geometry is uniform across bands (max_band_nrows rows padded with
    # invalid rows), so the jitted kernel compiles once.
    zp = _AxisPlan(
        range(max_band_nrows), patch_shape[0], overlap[0], trim, nz
    )

    # Per-axis pad index maps (grid reflection + deep edge extension on
    # the sharded axes), used to slice each shard's slab from the source
    # without materializing a padded volume.
    z_map_len = max(
        max(
            p["in_range"][0] + (nz * zp.rpd - 1) * zp.stride
            + patch_shape[0]
            for p in band_plans
        ),
        dim[0],
    )
    map_z = _axis_pad_map(dim[0], patch_shape[0], ranges[0], z_map_len)
    map_y = _axis_pad_map(
        dim[1], patch_shape[1], ranges[1], yp.padded_len(dim[1])
    )
    map_x = _axis_pad_map(
        dim[2], patch_shape[2], ranges[2],
        max(ranges[2][-1] + patch_shape[2], dim[2]),
    )
    wp = len(map_x)

    def load_slab(i, j, in_lo):
        """One (slab_z, slab_y, wp) f32 slab, brightness-clipped."""
        zsel = map_z[in_lo + i * zp.own: in_lo + i * zp.own + zp.slab]
        ysel = map_y[j * yp.own: j * yp.own + yp.slab]
        z_lo, z_hi = int(zsel.min()), int(zsel.max()) + 1
        y_lo, y_hi = int(ysel.min()), int(ysel.max()) + 1
        block = np.asarray(img[z_lo:z_hi, y_lo:y_hi, :], dtype=np.float32)
        slab = block[np.ix_(zsel - z_lo, ysel - y_lo, map_x)]
        return np.minimum(slab, np.float32(brightness_clip))

    if y_axis is None:
        slab_spec = P(z_axis)
        gshape = (nz, zp.slab, yp.slab, wp)
    else:
        slab_spec = P(z_axis, y_axis)
        gshape = (nz, ny, zp.slab, yp.slab, wp)
    slab_sharding = NamedSharding(mesh, slab_spec)
    dev_grid = mesh.devices.reshape(nz, ny)
    pid = jax.process_index()

    def build_slabs(in_lo):
        # Ship per-device slabs one at a time: host memory stays O(1
        # slab). Multi-process meshes: each process reads ONLY the slabs
        # its own devices hold (process-local IO).
        pieces = []
        for i in range(nz):
            for j in range(ny):
                if dev_grid[i, j].process_index != pid:
                    continue
                block = load_slab(i, j, in_lo)
                lead = (1,) if y_axis is None else (1, 1)
                pieces.append(
                    jax.device_put(block.reshape(lead + block.shape),
                                   dev_grid[i, j])
                )
        return jax.make_array_from_single_device_arrays(
            gshape, slab_sharding, pieces
        )

    mesh_axes = tuple(a for a in (z_axis, y_axis) if a)

    # --- Normalization ------------------------------------------------
    # Single band: exact global percentiles on device (masked radix
    # order stats psum across the mesh, np.percentile's float64
    # interpolation on the two fetched scalars -- no host pass).
    # Banded: the band slabs never coexist on device, so the exact
    # host-streaming radix percentile runs over the lazy source instead.
    first_slabs = None
    if banded:
        from aind_exaspim_neuron_segmentation_tpu.core.normalize import (
            streaming_percentile,
        )

        with _st("normalize"):
            mn, mx = streaming_percentile(
                img, normalization_percentiles,
                transform=lambda b: np.minimum(b, brightness_clip),
            )
    else:
        n_total = int(np.prod(dim))
        ks, q_plan = stats.rank_plan(n_total, normalization_percentiles)

        def stats_body(slab):
            s = slab.reshape(slab.shape[-3:])
            iz = jax.lax.axis_index(z_axis)
            iy = jax.lax.axis_index(y_axis) if y_axis else jnp.int32(0)
            tz = jnp.arange(zp.slab)
            mz = (((tz < zp.own) | (iz == nz - 1))
                  & (iz * zp.own + tz < dim[0]))
            ty = jnp.arange(yp.slab)
            my = (((ty < yp.own) | (iy == ny - 1))
                  & (iy * yp.own + ty < dim[1]))
            mx_ = jnp.arange(wp) < dim[2]
            mask = (mz[:, None, None] & my[None, :, None]
                    & mx_[None, None, :])
            vals = jnp.where(mask, s, jnp.inf)
            return stats.order_stats_sharded(vals, tuple(ks), mesh_axes)

        stats_fn = jax.jit(
            shard_map(stats_body, mesh=mesh, in_specs=(slab_spec,),
                      out_specs=P())
        )
        with _st("load_slabs"):
            first_slabs = build_slabs(band_plans[0]["in_range"][0])
        with _st("normalize"):
            order_vals = np.asarray(stats_fn(first_slabs), np.float64)
        bounds = []
        for idx_lo, idx_hi, frac in q_plan:
            v = order_vals[idx_lo]
            if idx_hi is not None:
                v = v + (order_vals[idx_hi] - v) * frac
            bounds.append(v)
        mn, mx = bounds
    norm = jnp.asarray([mn, mx - mn + 1e-8], jnp.float32)

    # --- Patch starts / masks / blend weights -------------------------
    # Starts are band-local and identical for every band (consecutive
    # grid rows at uniform stride); only validity varies with the
    # band's real row count.
    xs = list(ranges[2])
    per_dev = zp.rpd * yp.rpd * len(xs)
    pad_n = (-per_dev) % batch_size
    n_local = per_dev + pad_n
    starts = np.zeros((nz, ny, n_local, 3), np.int32)
    for i in range(nz):
        for j in range(ny):
            k = 0
            for rz in range(zp.rpd):
                for ry in range(yp.rpd):
                    for x in xs:
                        starts[i, j, k] = (
                            rz * zp.stride, ry * yp.stride, x
                        )
                        k += 1

    def build_valid(n_rows_b):
        valid = np.zeros((nz, ny, n_local), np.float32)
        for i in range(nz):
            for j in range(ny):
                k = 0
                for rz in range(zp.rpd):
                    for ry in range(yp.rpd):
                        for _x in xs:
                            ok = (
                                i * zp.rpd + rz < n_rows_b
                                and j * yp.rpd + ry < len(yp.starts)
                            )
                            valid[i, j, k] = 1.0 if ok else 0.0
                            k += 1
        return valid

    if blend_mode == "gaussian":
        sigmas = [(blend_sigma or p / 6.0) for p in patch_shape]
        host_windows = tuple(
            stitch.gaussian_window(p, trim, s)
            for p, s in zip(patch_shape, sigmas)
        )
        windows = tuple(jnp.asarray(w) for w in host_windows)
    elif blend_mode == "uniform":
        host_windows = None
        windows = None
    else:
        raise ValueError(f"unknown blend_mode {blend_mode!r}")

    # Per-slot weight slices over the kept (own + spill) windows; the
    # global per-axis weight vectors are sliced at each band's offset.
    wz, wy, wx = stitch.separable_weights(
        dim, patch_shape, overlap, trim, windows=host_windows
    )
    wz_ext = np.concatenate([
        wz, np.zeros(z_map_len + zp.patch, np.float32)
    ])

    def shard_weights_z(in_lo):
        return np.stack([
            wz_ext[in_lo + d * zp.own + trim:
                   in_lo + d * zp.own + trim + zp.own + zp.spill]
            for d in range(nz)
        ])

    wy_ext = np.concatenate([
        wy, np.zeros(ny * yp.own + yp.spill + yp.patch, np.float32)
    ])
    wy_shards = np.stack([
        wy_ext[d * yp.own + trim:
               d * yp.own + trim + yp.own + yp.spill]
        for d in range(ny)
    ])
    wx_pad = np.concatenate([wx, np.zeros(wp - len(wx), np.float32)])

    module = runner.module
    ps = tuple(patch_shape)

    def body(variables, norm_l, slab, starts_l, valid_l, wz_l, wy_l, wx_l):
        slab = slab.reshape(slab.shape[-3:])
        slab = jnp.clip((slab - norm_l[0]) / norm_l[1], 0.0, 1.0)
        starts_l = starts_l.reshape(starts_l.shape[-2:])
        valid_l = valid_l.reshape(valid_l.shape[-1:])
        wz_l = wz_l.reshape(wz_l.shape[-1:])
        wy_l = wy_l.reshape(wy_l.shape[-1:])
        acc = stitch.accumulate_core(
            variables, slab, starts_l, valid_l, module=module,
            patch_shape=ps, trim=trim, batch_size=batch_size,
            out_channels=out_channels, vma_axes=mesh_axes,
            windows=windows,
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
        if predigest:
            from aind_exaspim_neuron_segmentation_tpu.ops.predigest import (
                predigest_shard,
            )

            # Incoming-edge halos: each shard's first plane needs the
            # predecessor's last OWNED plane of the corresponding
            # affinity channel (final after the spill phases above).
            # First shards receive zeros -- which equals the volume's
            # zero trim margin at global z_off-1 / y_off-1.
            prev_z = jnp.zeros_like(blended[0, 0])
            if nz > 1:
                prev_z = jax.lax.ppermute(
                    blended[0, zp.own - 1], z_axis,
                    [(i, i + 1) for i in range(nz - 1)],
                )
            prev_y = jnp.zeros_like(blended[1, :, 0])
            if y_axis is not None and ny > 1:
                prev_y = jax.lax.ppermute(
                    blended[1, :, yp.own - 1], y_axis,
                    [(j, j + 1) for j in range(ny - 1)],
                )
            iz = jax.lax.axis_index(z_axis)
            iy = jax.lax.axis_index(y_axis) if y_axis else jnp.int32(0)
            plan_b, qaff_b = predigest_shard(
                blended,
                prev_z, prev_y,
                iz * zp.own + trim, iy * yp.own + trim,
                tuple(dim),
            )
            digest = jnp.concatenate([plan_b[None], qaff_b], axis=0)
            return digest.reshape((1,) * len(mesh_axes) + digest.shape)
        return blended.reshape((1,) * len(mesh_axes) + blended.shape)

    if y_axis is None:
        wz_spec = P(z_axis)
        wy_spec = P()
        out_spec = P(z_axis)
    else:
        wz_spec = P(z_axis)
        wy_spec = P(y_axis)
        out_spec = P(z_axis, y_axis)
    spec_in = (
        P(), P(), slab_spec, slab_spec, slab_spec, wz_spec, wy_spec, P(),
    )
    fn = jax.jit(
        shard_map(body, mesh=mesh, in_specs=spec_in, out_specs=out_spec)
    )

    def put(arr, spec):
        # make_array_from_callback works on multi-process meshes (each
        # process materializes only its addressable pieces of the
        # host-deterministic array); on one process it equals device_put.
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
        )

    # --- Output sinks --------------------------------------------------
    multiproc = jax.process_count() > 1
    if multiproc and out_path is None and not allow_partial:
        raise ValueError(
            "multi-process predict_sharded without out_path returns a "
            "partially-filled array on each process (only its own "
            "shards; zeros elsewhere). Pass out_path= for a complete "
            "store assembled across processes, or allow_partial=True "
            "to accept the process-local fill."
        )
    ysplit_chunks = None  # (cy, cx) when Z rows split Y across processes
    if multiproc and out_path is not None and y_axis is not None:
        # Process-local streaming output: a Z row whose Y shards live on
        # more than one process means two processes write the SAME z
        # planes. That is safe iff the store's Y chunk grid is aligned
        # to every Y shard boundary (trim + j*own), so the processes
        # touch disjoint chunk keys. gcd(trim, own) divides all of
        # them (and the leading trim offset); use it as the chunk
        # height unless it is degenerate.
        local_ids = {d.id for d in jax.local_devices()}
        split = any(
            0 < sum(dev_grid[i, j].id in local_ids for j in range(ny)) < ny
            for i in range(nz)
        )
        if split:
            ysplit_chunks = _ysplit_chunk_grid(trim, yp.own, dim)
    writer = None
    plane_writer = None
    digest_writers = None
    out = None
    asm_channels = 4 if predigest else out_channels
    asm_dtype = np.uint8 if predigest else np.float32
    out_shape = (out_channels,) + tuple(dim) if affinity_mode else dim
    if out_path is not None and predigest:
        # Two u8 stores (plan, qaff); same row streaming as the float
        # writers -- ZarrPlaneWriter rows are process-disjoint on
        # multi-process meshes, ZarrAppendWriter otherwise.
        from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
            ZarrAppendWriter, ZarrPlaneWriter,
        )

        cls = ZarrPlaneWriter if multiproc else ZarrAppendWriter
        dw_kw = {"chunks_yx": ysplit_chunks} if ysplit_chunks else {}
        digest_writers = (
            cls(out_path[0], tuple(dim), np.uint8, **dw_kw),
            cls(out_path[1], (3,) + tuple(dim), np.uint8, **dw_kw),
        )

        def emit(z_lo, z_hi, block, y_ranges=None):
            if multiproc:
                for ya, yb in y_ranges or [(0, dim[1])]:
                    digest_writers[0].write_planes(
                        z_lo, block[0][:, ya:yb], y0=ya
                    )
                    digest_writers[1].write_planes(
                        z_lo, block[1:][:, :, ya:yb], y0=ya
                    )
            else:
                digest_writers[0].append(block[0])
                digest_writers[1].append(block[1:])
    elif out_path is not None and multiproc:
        # Each process writes ONLY its own Z rows: one-plane-deep output
        # chunks make disjoint z-ranges touch disjoint chunk keys, so no
        # cross-process coordination is needed; unwritten chunks read as
        # the zarr fill value (the never-covered trim planes). When a Z
        # row's Y shards span processes, the Y-shard-aligned chunk grid
        # (``ysplit_chunks``) keeps the per-process writes on disjoint
        # keys too; each process then emits only its own Y ranges.
        from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
            ZarrPlaneWriter,
        )

        plane_writer = ZarrPlaneWriter(
            out_path, out_shape, np.float32,
            **({"chunks_yx": ysplit_chunks} if ysplit_chunks else {}),
        )

        def emit(z_lo, z_hi, block, y_ranges=None):
            data = block if affinity_mode else block[0]
            for ya, yb in y_ranges or [(0, dim[1])]:
                plane_writer.write_planes(z_lo, data[..., ya:yb, :],
                                          y0=ya)
    elif out_path is not None:
        from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
            ZarrAppendWriter,
        )

        writer = ZarrAppendWriter(out_path, out_shape, np.float32)

        def emit(z_lo, z_hi, block, y_ranges=None):
            writer.append(block if affinity_mode else block[0])
    else:
        # Dense assembly. On multi-process meshes each process fills only
        # the rows its devices own; everything else stays zero. With
        # predigest the 4 u8 channels are [plan, qaff_z, qaff_y, qaff_x];
        # zero margins ARE the correct digest of the zero trim planes.
        out = np.zeros((asm_channels,) + tuple(dim), asm_dtype)

        def emit(z_lo, z_hi, block, y_ranges=None):
            out[:, z_lo:z_hi] = block

    # --- Band loop ------------------------------------------------------
    next_z = 0
    dense_starts = starts[:, 0] if y_axis is None else starts
    for plan in band_plans:
        in_lo = plan["in_range"][0]
        own_lo, own_hi = plan["own"]
        n_rows_b = len(plan["rows"])
        valid = build_valid(n_rows_b)
        with _st("load_slabs"):
            slabs = (
                first_slabs
                if (first_slabs is not None and plan is band_plans[0])
                else build_slabs(in_lo)
            )
        first_slabs = None  # free after use
        valid_in = valid[:, 0] if y_axis is None else valid
        with _st("forward"):
            out_shards = fn(
                runner.variables,
                norm,
                slabs,
                put(dense_starts, slab_spec),
                put(valid_in, slab_spec),
                put(shard_weights_z(in_lo), wz_spec),
                put(wy_shards, wy_spec),
                jnp.asarray(wx_pad),
            )
        del slabs
        # (nz[, ny], C, own_z + spill_z, own_y + spill_y, wp)

        shard_data = {}
        for sh in out_shards.addressable_shards:
            idx = tuple(sl.start or 0 for sl in sh.index)
            i = idx[0]
            j = idx[1] if y_axis is not None else 0
            shard_data[(i, j)] = sh.data

        # Assembly: each slot owns [z_base, z_base + own) clipped to the
        # band's owned range; the band's last real slot also keeps its
        # unsent spill. Rows materialize in Z order (one row dense at a
        # time) so out_path streaming stays O(one row).
        with _st("fetch_assemble"):
            for i in range(nz):
                z_base = in_lo + i * zp.own + trim
                hard_hi = min(own_hi, dim[0])
                if z_base >= hard_hi:
                    break
                last_b = (
                    i == nz - 1
                    or in_lo + (i + 1) * zp.own + trim >= hard_hi
                )
                z_hi_dev = min(
                    z_base + zp.own + (zp.spill if last_b else 0), hard_hi
                )
                if z_hi_dev <= next_z:
                    if last_b:
                        break
                    continue
                local_js = [j for j in range(ny) if (i, j) in shard_data]
                if multiproc and not local_js:
                    next_z = z_hi_dev
                    if last_b:
                        break
                    continue
                row = np.zeros(
                    (asm_channels, z_hi_dev - next_z, dim[1], dim[2]),
                    asm_dtype,
                )
                row_off = max(z_base - next_z, 0)  # leading trim gap
                src_z0 = max(next_z - z_base, 0)   # skip recomputed planes
                for j in range(ny):
                    y_base = j * yp.own + trim
                    if y_base >= dim[1]:
                        break
                    last_y = (
                        j == ny - 1 or (j + 1) * yp.own + trim >= dim[1]
                    )
                    y_hi = min(
                        y_base + yp.own + (yp.spill if last_y else 0), dim[1]
                    )
                    if (i, j) in shard_data:
                        # a Y shard another process owns stays zero in
                        # this process's (allow_partial) dense output
                        data = np.asarray(shard_data[(i, j)])
                        data = data.reshape(data.shape[-4:])
                        n_planes = z_hi_dev - max(z_base, next_z)
                        row[:, row_off:, y_base:y_hi] = data[
                            :, src_z0: src_z0 + n_planes, : y_hi - y_base,
                            : dim[2]
                        ]
                    if last_y:
                        break
                if multiproc and out_path is not None:
                    y_ranges = None
                    if ysplit_chunks is not None:
                        # write ONLY this process's Y shard extents
                        # (chunk-aligned by construction); merge
                        # adjacent shards into one range
                        y_ranges = []
                        for j in local_js:
                            y_base = j * yp.own + trim
                            if y_base >= dim[1]:
                                continue
                            last_y = (
                                j == ny - 1
                                or (j + 1) * yp.own + trim >= dim[1]
                            )
                            y_hi = min(
                                y_base + yp.own
                                + (yp.spill if last_y else 0),
                                dim[1],
                            )
                            if last_y:
                                # the region above the last shard is
                                # globally unowned (reads as fill=0);
                                # round up to the chunk grid -- the
                                # row buffer is zero there
                                cy_out = ysplit_chunks[0]
                                y_hi = min(
                                    -(-y_hi // cy_out) * cy_out, dim[1]
                                )
                            if y_ranges and y_ranges[-1][1] == y_base:
                                y_ranges[-1] = (y_ranges[-1][0], y_hi)
                            else:
                                y_ranges.append((y_base, y_hi))
                    # skip leading gaps: those planes belong to the zarr
                    # fill value or to rows another process owns
                    emit(next_z + row_off, z_hi_dev, row[:, row_off:],
                         y_ranges=y_ranges)
                else:
                    emit(next_z, z_hi_dev, row)
                next_z = z_hi_dev
                if last_b:
                    break

    if (
        (writer is not None or (digest_writers and not multiproc))
        and next_z < dim[0]
    ):
        # trailing never-covered trim planes (the append writers must
        # cover the full declared extent; the plane writer reads them
        # as fill; dense output is already zero there)
        emit(
            next_z, dim[0],
            np.zeros((asm_channels, dim[0] - next_z, dim[1], dim[2]),
                     asm_dtype),
        )

    if multiproc and (digest_writers is not None or writer is not None
                      or plane_writer is not None):
        # Host-side writes are NOT synchronized by the device
        # collectives: an early-finishing process returning its lazy
        # handle could read z-rows a peer has not flushed yet (fill
        # value instead of data). Barrier before anyone reads.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("predict_sharded:flush")
    if digest_writers is not None:
        from aind_exaspim_neuron_segmentation_tpu.io import read

        if not multiproc:  # append writers verify+flush; plane writers
            for dw in digest_writers:  # need no close (chunked puts)
                dw.close()
        return read(out_path[0]), read(out_path[1])
    if writer is not None or plane_writer is not None:
        from aind_exaspim_neuron_segmentation_tpu.io import read

        if writer is not None:
            writer.close()
        return read(out_path)
    if predigest:
        return out[0], np.ascontiguousarray(out[1:])
    return out if affinity_mode else out[0]
