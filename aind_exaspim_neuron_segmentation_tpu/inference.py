"""Inference pipeline: predict -> segment -> skeletonize.

Public surface mirrors the reference ``inference.py`` module:
``predict`` (inference.py:29), ``affinities_to_segmentation``
(inference.py:196), ``segmentation_to_zipped_swcs`` (inference.py:240),
``skeletonize`` (inference.py:257), ``skeletons_to_zipped_swcs``
(inference.py:294), ``voxelize_skeletons`` (inference.py:313),
``count_patches`` (inference.py:340), ``generate_patch_starts``
(inference.py:368), ``load_model`` (inference.py:400), ``to_tensor``
(inference.py:427).

TPU-native internals: the sliding window runs entirely on device
(``ops.stitch``), streaming the volume in Z slabs when it exceeds the
device memory budget; slab boundaries recompute one overlapping patch row
so every output voxel is final without host-side blending -- the same
decomposition the multi-chip path shards over a mesh.
"""

import zipfile

import jax
import jax.numpy as jnp
import numpy as np

from aind_exaspim_neuron_segmentation_tpu.core.normalize import (
    DEFAULT_PERCENTILES,
    normalize,
)
from aind_exaspim_neuron_segmentation_tpu.core.patches import (
    count_patches,  # noqa: F401  (re-export, reference inference.py:340)
    generate_patch_starts,  # noqa: F401  (reference inference.py:368)
    patch_grid_ranges,
)
from aind_exaspim_neuron_segmentation_tpu.models.unet3d import UNet3D
from aind_exaspim_neuron_segmentation_tpu.models.convert import (
    fold_batchnorm,
    load_pth_variables,
)
from aind_exaspim_neuron_segmentation_tpu.ops import stitch


class ModelRunner:
    """A UNet3D module + variables bound for inference.

    Plays the role of the reference's ``torch.nn.Module`` handle returned
    by ``load_model`` (inference.py:400-424).
    """

    def __init__(self, module, variables):
        self.module = module
        self.variables = variables

    @property
    def output_channels(self):
        """Number of prediction channels (3 affinity or 1 mask)."""
        return self.module.output_channels

    def __call__(self, x):
        """Forward logits for a (N, 1, D, H, W) or (N, D, H, W, 1) batch."""
        x = jnp.asarray(x)
        channels_first = x.shape[1] == 1 and x.shape[-1] != 1
        if channels_first:
            x = jnp.moveaxis(x, 1, -1)
        out = self.module.apply(self.variables, x, train=False)
        if channels_first:
            out = jnp.moveaxis(out, -1, 1)
        return out


def load_model(path=None, affinity_mode=True, device=None, dtype=None,
               width_multiplier=1, trilinear=True, fold_bn=None):
    """Build a UNet3D runner, optionally restoring a ``.pth`` checkpoint.

    Mirrors reference inference.py:400-424 (3 output channels for affinity
    mode, 1 for foreground/background; eval mode). ``dtype`` selects the
    activation compute dtype -- defaults to bfloat16 on TPU backends and
    float32 elsewhere. ``path=None`` initializes random weights (useful
    for benchmarks and smoke tests; the reference requires a checkpoint).

    ``fold_bn`` folds eval-mode BatchNorm into the conv kernels
    (:func:`~.models.convert.fold_batchnorm`): each DoubleConv block
    becomes two convs whose bias + LeakyReLU epilogues fuse into the conv
    on TPU, removing the full-resolution elementwise BN passes over HBM.
    Default: enabled for bfloat16 (production TPU inference), disabled
    for float32 (bit-stable parity oracle; folding itself is exact to
    ~6e-9 MAE in float32).
    """
    if dtype is None:
        dtype = (
            jnp.bfloat16
            if jax.default_backend() not in ("cpu",)
            else jnp.float32
        )
    if fold_bn is None:
        fold_bn = dtype == jnp.bfloat16
    out_channels = 3 if affinity_mode else 1
    module = UNet3D(
        output_channels=out_channels,
        trilinear=trilinear,
        width_multiplier=width_multiplier,
        dtype=dtype,
        fused_bn=fold_bn,
    )
    if path is not None:
        variables = load_pth_variables(path, trilinear=trilinear)
    else:
        init_module = module if not fold_bn else UNet3D(
            output_channels=out_channels,
            trilinear=trilinear,
            width_multiplier=width_multiplier,
            dtype=dtype,
        )
        dummy = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
        variables = init_module.init(
            jax.random.PRNGKey(0), dummy, train=False
        )
    if fold_bn:
        variables = fold_batchnorm(variables, trilinear=trilinear)
    variables = jax.tree.map(jnp.asarray, variables)
    if device is not None:
        variables = jax.device_put(variables, device)
    return ModelRunner(module, variables)


def to_tensor(arr, device=None):
    """Expand to (1, 1, D, H, W) float32 on device (inference.py:427-446)."""
    arr = jnp.asarray(arr, dtype=jnp.float32)
    while arr.ndim < 5:
        arr = arr[jnp.newaxis, ...]
    if device is not None:
        arr = jax.device_put(arr, device)
    return arr


class _Volume5DView:
    """3D view over a lazy (1, 1, D, H, W) handle (AIND zarr layout)."""

    def __init__(self, handle):
        self.handle = handle
        self.shape = tuple(handle.shape[2:])
        self.ndim = 3

    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        return self.handle[(0, 0) + key]


def _slab_plan(z_starts, patch_z, trim, dim_z, max_rows, stride=None):
    """Split z-start rows into slabs of <= max_rows owned rows.

    Each slab recomputes the trailing rows of the previous slab whose
    trimmed output reaches into its owned range -- ``back`` rows, where
    back = ceil(core / stride) - 1 and core = patch - 2*trim (one row
    for the default 96/32/8 grid; more when the stride is small
    relative to the core). Only the owned output range ``[own_lo,
    own_hi)`` is kept; the union of owned ranges covers ``[0, dim_z)``.
    """
    plans = []
    n = len(z_starts)
    if stride is None:
        stride = z_starts[1] - z_starts[0] if n > 1 else patch_z
    core = patch_z - 2 * trim
    back = max(-(-core // stride) - 1, 0) if stride > 0 else 0
    for i0 in range(0, n, max_rows):
        i1 = min(i0 + max_rows, n)
        rows = list(range(max(i0 - back, 0), i1))
        own_lo = 0 if i0 == 0 else z_starts[i0] + trim
        own_hi = dim_z if i1 == n else z_starts[i1] + trim
        in_lo = z_starts[rows[0]]
        in_hi = z_starts[rows[-1]] + patch_z
        plans.append(
            dict(rows=rows, own=(own_lo, own_hi), in_range=(in_lo, in_hi))
        )
    return plans


def predict(
    img,
    model,
    affinity_mode=True,
    batch_size=16,
    brightness_clip=1000,
    normalization_percentiles=DEFAULT_PERCENTILES,
    patch_shape=(96, 96, 96),
    overlap=(32, 32, 32),
    trim=8,
    verbose=True,
    max_slab_rows=None,
    blend_mode="uniform",
    blend_sigma=None,
    out_path=None,
    predigest=False,
):
    """Sliding-window affinity / foreground prediction.

    Numerically matches reference inference.py:29-126: brightness clip,
    full-volume percentile normalization, overlapping patch grid, sigmoid,
    ``trim``-voxel border trim, hit-count blend (zero where never covered).

    ``img`` may be (D, H, W) or (1, 1, D, H, W). Returns float32
    ``(3, D, H, W)`` in affinity mode else ``(D, H, W)``.

    ``max_slab_rows`` caps how many Z patch-rows are resident on device at
    once (default: chosen from a ~2 GiB per-slab accumulator budget --
    two slabs may be resident in the fetch pipeline, so ~4 GiB total);
    slabs beyond the first recompute one boundary row instead of
    blending on host.

    ``blend_mode``: 'uniform' reproduces the reference's hit-count
    average; 'gaussian' fades overlapping patches into each other with a
    separable gaussian window (sigma defaults to patch/6), removing seam
    artifacts at patch borders. Both divide by the accumulated weight and
    leave never-covered voxels at exactly 0.

    ``out_path``: when set, slab outputs stream into a Zarr store at
    this path as they finish (at most one slab + one chunk row of the
    output resident in host RAM -- volumes larger than memory are fine)
    and the return value is a lazy Zarr handle instead of an ndarray.

    ``predigest``: affinity mode only -- digest each slab ON DEVICE
    into the native postprocess inputs (:mod:`.ops.predigest`) and
    return ``(plan uint8 (D, H, W), qaff uint8 (3, D, H, W))`` instead
    of float affinities: 4 bytes/voxel fetched instead of 12, and
    ``affinities_to_segmentation((plan, qaff))`` then skips every float
    read on the host. Uses the default watershed thresholds
    (low=0.1, high=0.9999). With ``out_path=(plan_path, qaff_path)``
    the two digests stream into Zarr stores (4 bytes/voxel of disk
    instead of 12 for float affinities) and the returned pair is lazy
    handles -- ``affinities_to_segmentation`` accepts it directly for
    the beyond-RAM pipeline with no re-digest pass.
    """
    # Lazy (chunked) inputs stream slab-by-slab; in-memory arrays follow
    # the reference's dense path exactly (inference.py:79-80). Both give
    # identical numbers: the streaming percentile is exact (radix
    # select) and the clip+scale is elementwise.
    lazy = not isinstance(img, (np.ndarray, jnp.ndarray, list, tuple))
    if not lazy:
        img = np.asarray(img)
    if getattr(img, "ndim", 0) == 5:
        img = _Volume5DView(img) if lazy else img[0, 0]
    if img.ndim != 3:
        raise ValueError(f"expected 3D or 5D input, got shape {img.shape}")

    if lazy:
        from aind_exaspim_neuron_segmentation_tpu.core.normalize import (
            streaming_percentile,
        )

        mn, mx = streaming_percentile(
            img, normalization_percentiles,
            transform=lambda b: np.minimum(b, brightness_clip),
        )

        def load_slab(lo, hi):
            block = np.asarray(img[lo:hi], dtype=np.float32)
            block = np.minimum(block, brightness_clip)
            block = (block - mn) / (mx - mn + 1e-8)
            return np.clip(block, 0.0, 1.0)
    else:
        img = np.minimum(img, brightness_clip)
        img = normalize(img, percentiles=normalization_percentiles)
        img = np.ascontiguousarray(img, dtype=np.float32)

        def load_slab(lo, hi):
            return img[lo:hi]

    out_channels = 3 if affinity_mode else 1
    runner = model if isinstance(model, ModelRunner) else ModelRunner(*model)
    if runner.output_channels != out_channels:
        raise ValueError(
            f"model has {runner.output_channels} output channels, "
            f"affinity_mode={affinity_mode} needs {out_channels}"
        )
    if predigest:
        if not affinity_mode:
            raise ValueError("predigest requires affinity_mode=True")
        if out_path is not None and (
            not isinstance(out_path, (tuple, list)) or len(out_path) != 2
        ):
            raise ValueError(
                "predigest streams TWO stores; pass "
                "out_path=(plan_path, qaff_path)"
            )
        from aind_exaspim_neuron_segmentation_tpu.ops.predigest import (
            predigest_slab,
        )

    dim = img.shape
    ranges = patch_grid_ranges(dim, patch_shape, overlap)
    if any(len(r) == 0 for r in ranges):
        # An axis shorter than the overlap yields an empty grid: the
        # reference's patch loop never runs and returns zeros. The
        # out_path contract (stores written, lazy handles returned)
        # still holds on this corner.
        from aind_exaspim_neuron_segmentation_tpu.io import read
        from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
            write_zarr,
        )

        if predigest:
            plan = np.zeros(tuple(dim), np.uint8)
            qaff = np.zeros((3,) + tuple(dim), np.uint8)
            if out_path is not None:
                write_zarr(out_path[0], plan)
                write_zarr(out_path[1], qaff)
                return read(out_path[0]), read(out_path[1])
            return plan, qaff
        out = np.zeros((out_channels,) + tuple(dim), np.float32)
        out = out if affinity_mode else out[0]
        if out_path is not None:
            write_zarr(out_path, out)
            return read(out_path)
        return out
    z_starts = list(ranges[0])
    if blend_mode == "gaussian":
        sigmas = [
            (blend_sigma or p / 6.0) for p in patch_shape
        ]
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
    wz, wy, wx = stitch.separable_weights(
        dim, patch_shape, overlap, trim,
        windows=host_windows,
    )

    if max_slab_rows is None:
        # ~2 GiB f32 accumulator budget per slab (two slabs may be
        # resident at once in the fetch pipeline): rows such that
        # out_channels * (rows*stride + patch) * H * W * 4 <= budget.
        stride_z = patch_shape[0] - overlap[0]
        budget = 2 * 1024**3
        per_z = out_channels * dim[1] * dim[2] * 4
        max_slab_rows = max((budget // per_z - patch_shape[0]) // stride_z, 1)

    plans = _slab_plan(z_starts, patch_shape[0], trim, dim[0], max_slab_rows)
    writer = plan_writer = qaff_writer = out = None
    if out_path is not None and predigest:
        from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
            ZarrAppendWriter,
        )

        plan_writer = ZarrAppendWriter(out_path[0], dim, np.uint8)
        qaff_writer = ZarrAppendWriter(out_path[1], (3,) + dim, np.uint8)
    elif out_path is not None:
        from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
            ZarrAppendWriter,
        )

        out_shape = (
            (out_channels,) + dim if affinity_mode else dim
        )
        writer = ZarrAppendWriter(out_path, out_shape, np.float32)
    elif predigest:
        plan_out = np.zeros(dim, np.uint8)
        qaff_out = np.zeros((3,) + dim, np.uint8)
    else:
        out = np.zeros((out_channels,) + dim, dtype=np.float32)
    pbar = None
    if verbose:
        from tqdm import tqdm

        pbar = tqdm(
            total=count_patches(dim, patch_shape, overlap), desc="Predict"
        )

    # One-slab-deep pipeline: dispatch slab i+1's device work (all JAX
    # calls are async) before fetching slab i's result, so the device
    # queue stays fed while the host copies results out.
    pending = None  # (own_lo, own_hi, device payload)
    prev_plane = None  # predigest: previous slab's last z-aff plane

    def fetch(entry):
        own_lo, own_hi, payload = entry
        if predigest:
            plan_dev, qaff_dev = payload
            if plan_writer is not None:
                plan_writer.append(np.asarray(plan_dev))
                qaff_writer.append(np.asarray(qaff_dev))
            else:
                plan_out[own_lo:own_hi] = np.asarray(plan_dev)
                qaff_out[:, own_lo:own_hi] = np.asarray(qaff_dev)
        elif writer is not None:
            block = np.asarray(payload)
            writer.append(block if affinity_mode else block[0])
        else:
            out[:, own_lo:own_hi] = np.asarray(payload)
        if pbar is not None:
            planes = own_hi - own_lo
            est = int(
                round(pbar.total * planes / dim[0])
            )
            pbar.update(min(est, pbar.total - pbar.n))

    for plan in plans:
        in_lo, in_hi = plan["in_range"]
        slab = load_slab(in_lo, min(in_hi, dim[0]))
        # Pad with the REAL grid so the reflection anchors at the last
        # patch's tail segment (passing the slab extent as the patch
        # would anchor at the slab start and diverge from per-patch
        # reflect whenever the tail is shorter than the pad).
        slab, _ = stitch.reflect_pad_to_grid(slab, patch_shape, overlap)
        # Grid starts inside the slab: plan rows x (y, x) ranges, padded in
        # Y/X like the full volume so every patch is full-size.
        starts = [
            (z_starts[r] - in_lo, y, x)
            for r in plan["rows"]
            for y in ranges[1]
            for x in ranges[2]
        ]
        n_real = len(starts)
        pad_n = (-n_real) % batch_size
        starts += [starts[0]] * pad_n
        starts_arr = jnp.asarray(np.asarray(starts, dtype=np.int32))
        valid = jnp.asarray(
            np.concatenate(
                [np.ones(n_real, np.float32), np.zeros(pad_n, np.float32)]
            )
        )
        acc = stitch.accumulate_predictions(
            runner.variables,
            jnp.asarray(slab),
            starts_arr,
            valid,
            module=runner.module,
            patch_shape=tuple(patch_shape),
            trim=trim,
            batch_size=batch_size,
            out_channels=out_channels,
            windows=windows,
        )
        own_lo, own_hi = plan["own"]
        blended = stitch.divide_by_weights(
            acc[:, own_lo - in_lo: own_hi - in_lo, : dim[1], : dim[2]],
            jnp.asarray(wz[own_lo:own_hi]),
            jnp.asarray(wy),
            jnp.asarray(wx),
        )
        if predigest:
            # Device-side digest of the FINAL slab values; the previous
            # slab's last z-affinity plane supplies the incoming -z
            # candidate at this slab's first plane.
            plan_dev, qaff_dev = predigest_slab(
                blended, prev_plane,
                first_slab=(own_lo == 0), last_slab=(own_hi == dim[0]),
            )
            prev_plane = blended[0, -1]
            payload = (plan_dev, qaff_dev)
        else:
            payload = blended
        if pending is not None:
            fetch(pending)
        pending = (own_lo, own_hi, payload)
    if pending is not None:
        fetch(pending)
    if pbar is not None:
        pbar.n = pbar.total
        pbar.refresh()
        pbar.close()

    if plan_writer is not None:
        from aind_exaspim_neuron_segmentation_tpu.io import read

        plan_writer.close()
        qaff_writer.close()
        return read(out_path[0]), read(out_path[1])
    if writer is not None:
        from aind_exaspim_neuron_segmentation_tpu.io import read

        writer.close()
        return read(out_path)
    if predigest:
        return plan_out, qaff_out
    return out if affinity_mode else out[0]


# --- Segmentation and skeletonization (native C++ engines) ---


def affinities_to_segmentation(
    affinities,
    agglomeration_thresholds=(0.6, 0.8, 0.9),
    min_segment_size=100,
    aff_threshold_low=0.1,
    aff_threshold_high=0.9999,
    out_path=None,
    tmp_dir=None,
    verbose=False,
):
    """Affinity map -> instance segmentation.

    Mirrors reference inference.py:196-237: seeded watershed + hierarchical
    supervoxel agglomeration over the requested thresholds, keeping only
    the final threshold's segmentation, then dropping segments of
    ``<= min_segment_size`` voxels and renumbering contiguously.

    ``affinities`` may be:

    * the float32 (3, D, H, W) volume (reference-dense path);
    * the ``(plan, qaff)`` uint8 pair from
      ``predict(..., predigest=True)`` (:mod:`.ops.predigest`): the TPU
      already reduced the float volume to per-voxel watershed decisions
      + 256-bin quantized affinities, so the host replays pure integer
      work with zero float reads -- bit-identical output;
    * a lazy chunked handle (zarr/N5) of shape (3, D, H, W), e.g. from
      ``predict(..., out_path=...)``: the fully streaming engine
      (:mod:`.postprocess.streaming` over native ``streamseg.cpp``)
      runs three Z-slab passes with O(RAG + slab) host RAM -- the
      float volume, the digests, the fragment volume, and the
      voxel-granular union-find are never dense in memory (temp disk
      holds ~7 bytes/voxel instead), keeping the reference's own
      beyond-RAM dead end (inference.py:222 densifies) out of this
      pipeline. Bit-identical to the dense path
      (tests/test_streamseg.py).

    The ``(plan, qaff)`` pair may itself be LAZY handles (from
    ``predict(..., predigest=True, out_path=(p1, p2))``): pass 1 then
    replays pure integer work straight from the plan store with no
    device involvement at all.

    ``out_path`` (lazy input only): stream the labeling into a Zarr
    store there and return the opened lazy handle instead of a dense
    array -- the full zarr-in/zarr-out beyond-RAM contract.
    ``tmp_dir``: where the streaming engine parks its temp memmaps.

    For the pre-digest pair the low/high thresholds are baked into the
    plan bytes at digest time; passing non-default ``aff_threshold_*``
    with a pre-digest pair is an error.
    """
    from aind_exaspim_neuron_segmentation_tpu import native, postprocess

    def _is_lazy(x):
        return not isinstance(x, (np.ndarray, jnp.ndarray, list)) and (
            not hasattr(x, "__array__")
        )

    predigested = isinstance(affinities, tuple) and len(affinities) == 2
    if predigested and _is_lazy(affinities[0]):
        # Lazy digest-store pair from predict(predigest=True,
        # out_path=(p1, p2)): pure integer streaming, no device pass.
        from aind_exaspim_neuron_segmentation_tpu.postprocess.streaming import (
            segment_streaming,
        )

        return segment_streaming(
            affinities,
            agglomeration_thresholds=agglomeration_thresholds,
            min_segment_size=min_segment_size,
            aff_threshold_low=aff_threshold_low,
            aff_threshold_high=aff_threshold_high,
            out_path=out_path,
            tmp_dir=tmp_dir,
            verbose=verbose,
        )
    lazy = not predigested and not isinstance(
        affinities, (np.ndarray, jnp.ndarray, list)
    )
    if lazy:
        from aind_exaspim_neuron_segmentation_tpu.postprocess.streaming import (
            segment_streaming,
        )

        return segment_streaming(
            affinities,
            agglomeration_thresholds=agglomeration_thresholds,
            min_segment_size=min_segment_size,
            aff_threshold_low=aff_threshold_low,
            aff_threshold_high=aff_threshold_high,
            out_path=out_path,
            tmp_dir=tmp_dir,
            verbose=verbose,
        )
    if out_path is not None:
        raise ValueError(
            "out_path streaming output requires a lazy (zarr/N5) "
            "affinity handle"
        )

    if predigested:
        plan, qaff = affinities
        if (aff_threshold_low, aff_threshold_high) != (0.1, 0.9999):
            raise ValueError(
                "aff thresholds are baked into the plan bytes at digest "
                "time; re-digest with ops.predigest for non-defaults"
            )
        seg = native.agglomerate_last_pre(
            plan, qaff, list(agglomeration_thresholds)
        )
        del plan, qaff, affinities
        return postprocess.remove_small_segments(seg, min_segment_size)

    affinities = np.ascontiguousarray(affinities, dtype=np.float32)
    seg = None
    for seg in postprocess.agglomerate(
        affinities,
        thresholds=list(agglomeration_thresholds),
        aff_threshold_low=aff_threshold_low,
        aff_threshold_high=aff_threshold_high,
    ):
        pass  # keep only the last threshold (reference deque maxlen=1)
    return postprocess.remove_small_segments(seg, min_segment_size)


def skeletonize(segmentation, anisotropy=(1.0, 1.0, 1.0)):
    """Segmentation -> {segment_id: Skeleton} via TEASAR.

    Parameter set mirrors reference inference.py:272-290 (kimimaro):
    scale=1.25, const=450, pdrf_exponent=4, pdrf_scale=100000, soma
    detection/acceptance 1000/3500, fix_borders, fill_holes, parallel=1.

    ``segmentation`` may be a dense uint32 volume or a lazy (zarr/N5)
    label handle, e.g. from ``affinities_to_segmentation(...,
    out_path=...)``: lazy handles stream through per-label bbox crops
    (postprocess.skeleton.skeletonize_lazy) with bit-identical output,
    so the full zarr -> SWC pipeline never densifies the volume.
    """
    from aind_exaspim_neuron_segmentation_tpu import postprocess

    return postprocess.skeletonize(
        segmentation,
        scale=1.25,
        const=450,
        pdrf_exponent=4,
        pdrf_scale=100000,
        soma_detection_threshold=1000,
        soma_acceptance_threshold=3500,
        soma_invalidation_scale=1.0,
        soma_invalidation_const=300,
        anisotropy=anisotropy,
        fix_borders=True,
        fill_holes=True,
    )


def skeletons_to_zipped_swcs(skeletons, zip_path):
    """Write ``{id}.swc`` entries into a ZIP (reference inference.py:294-310)."""
    with zipfile.ZipFile(zip_path, "w") as zf:
        for seg_id, skel in skeletons.items():
            zf.writestr(f"{seg_id}.swc", skel.to_swc())


def segmentation_to_zipped_swcs(segmentation, zip_path, anisotropy=(1, 1, 1)):
    """Segmentation -> TEASAR skeletons -> zipped SWC archive.

    Reference: inference.py:240-254. Accepts a dense volume or a lazy
    (zarr/N5) label handle (see :func:`skeletonize`).
    """
    skeletons = skeletonize(segmentation, anisotropy=anisotropy)
    skeletons_to_zipped_swcs(skeletons, zip_path)
    return skeletons


def voxelize_skeletons(skeletons, shape):
    """Rasterize skeleton vertices back into a label volume.

    Reference: inference.py:313-336 (inverse op / round-trip oracle).
    """
    out = np.zeros(shape, dtype=np.uint32)
    for seg_id, skel in skeletons.items():
        verts = np.round(np.asarray(skel.vertices)).astype(np.int64)
        keep = np.all((verts >= 0) & (verts < np.asarray(shape)), axis=1)
        v = verts[keep]
        out[v[:, 0], v[:, 1], v[:, 2]] = seg_id
    return out
