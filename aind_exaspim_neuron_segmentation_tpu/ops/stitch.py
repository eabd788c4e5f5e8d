"""Device-side sliding-window inference with overlap-blend stitching.

TPU-first redesign of the reference hot loop (inference.py:93-126): the
reference gathers patches on host, runs torch on device, copies results
back, and scatter-adds in NumPy -- crossing the host<->device boundary
twice per batch. Here the *entire* loop runs on device under one jit:

* the (reflect-padded) volume lives in HBM;
* a ``lax.scan`` walks batches of patch starts, gathering 96^3 blocks with
  ``dynamic_slice`` (no host traffic);
* the UNet forward runs in the caller's chosen activation dtype (bfloat16
  on TPU -> MXU);
* sigmoid + border-trim + accumulate fuse into the scan body; the
  scatter-add is a read-add-write ``dynamic_update_slice`` per patch;
* the per-voxel blend weight is not accumulated at all: it is the
  *separable* outer product of per-axis hit counts
  (``core.patches.blend_weight_map``), computed analytically and divided
  out on device. Voxels with zero weight stay exactly 0.0, matching the
  reference's ``np.divide(..., where=wgt != 0)``.

Numerical contract: identical to the reference for any grid -- each
patch's trimmed sigmoid output is accumulated over ``[start + trim,
start + patch - trim)`` clipped to the volume, then divided by hit count.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aind_exaspim_neuron_segmentation_tpu.core.patches import (
    patch_grid_ranges,
)


def gaussian_window(patch, trim, sigma):
    """Per-axis window over the trimmed core (float32, length p - 2t).

    Centered gaussian bump used by the optional 'gaussian' blend mode:
    overlapping patches fade into each other instead of averaging with
    uniform weight, removing seam artifacts at patch borders.
    """
    core = patch - 2 * trim
    pos = np.arange(core, dtype=np.float32) + trim
    center = (patch - 1) / 2.0
    return np.exp(-0.5 * ((pos - center) / sigma) ** 2).astype(np.float32)


def axis_hit_counts(dim, patch, overlap, trim, window=None):
    """1D accumulated blend weight along one axis (host, numpy).

    ``window=None`` gives the reference's uniform hit counts; otherwise
    each patch contributes ``window`` over its trimmed core.
    """
    counts = np.zeros(dim, dtype=np.float32)
    stride = patch - overlap
    for s in range(0, dim - patch + stride, stride):
        lo = min(s + trim, dim)
        hi = min(s + patch - trim, dim)
        if window is None:
            counts[lo:hi] += 1
        else:
            counts[lo:hi] += window[: hi - lo]
    return counts


def separable_weights(img_shape, patch_shape, overlap, trim, windows=None):
    """Per-axis weight vectors whose outer product is the weight map."""
    windows = windows or (None, None, None)
    return tuple(
        axis_hit_counts(d, p, o, trim, window=w)
        for d, p, o, w in zip(img_shape, patch_shape, overlap, windows)
    )


def reflect_pad_to_grid(img, patch_shape, overlap):
    """Reflect-pad a 3D volume so every grid patch is full-size.

    Exactly equivalent to the reference's per-patch clip + ``add_padding``
    reflect (img_util.py:362-428): only the LAST patch along an axis
    overhangs, and it always starts at the last grid start, so the
    per-patch reflection is a reflection of the clipped tail segment
    ``img[last_start:]`` about its own end -- including the multi-bounce
    case where the pad exceeds the tail length (np.pad handles repeated
    reflection within the segment). Reflecting about the whole volume's
    end instead would diverge whenever pad > tail_len - 1.
    """
    ranges = patch_grid_ranges(img.shape, patch_shape, overlap)
    pads = tuple(
        max(r[-1] + p - d, 0)
        for r, p, d in zip(ranges, patch_shape, img.shape)
    )
    if not any(pads):
        return img, pads
    # One preallocation + per-axis pad-plane fills: the previous
    # concatenate-per-axis grew the array with a FULL-volume copy per
    # padded axis (up to 3x multi-GB memcpy per slab on this host).
    # Fill order matters: axis k's reflection covers the already-padded
    # extent of axes < k and only the original extent of axes > k --
    # exactly the sequential-concatenate semantics.
    shape = tuple(d + pad for d, pad in zip(img.shape, pads))
    out = np.empty(shape, img.dtype)
    out[tuple(slice(0, d) for d in img.shape)] = img
    for axis in range(3):
        pad = pads[axis]
        if pad == 0:
            continue
        d = img.shape[axis]
        tail_start = ranges[axis][-1]
        # source plane for each pad position: np.pad 'reflect' of the
        # tail segment about its own end (multi-bounce included),
        # expressed as an index map so only pad planes are copied
        seg = np.arange(tail_start, d)
        idx = np.pad(seg, (0, pad), mode="reflect")[d - tail_start:]
        dst, src = [], []
        for a in range(3):
            if a < axis:
                dst.append(slice(0, shape[a]))
                src.append(slice(0, shape[a]))
            elif a == axis:
                dst.append(slice(d, shape[a]))
                src.append(idx)
            else:
                dst.append(slice(0, img.shape[a]))
                src.append(slice(0, img.shape[a]))
        out[tuple(dst)] = out[tuple(src)]
    return out, pads


def _forward_weighted(variables, volume, starts, valid, module,
                      patch_shape, trim, windows):
    """gather -> apply(valid_trim) -> sigmoid -> validity/window mask
    -> (B, C, core, core, core) float32.

    The ONE implementation behind both the per-batch jit
    (:func:`forward_batch`) and the scanned body
    (:func:`accumulate_core`) -- the two paths are asserted bit-exact
    by test, so the shared body keeps them from desynchronizing.
    """
    def gather(start):
        return jax.lax.dynamic_slice(volume, start, patch_shape)

    patches = jax.vmap(gather)(starts)
    # valid_trim: the model returns the trimmed core directly, computing
    # the final decoder stage only over it (exact; models/unet3d.py Up).
    logits = module.apply(
        variables, patches[..., None], train=False, valid_trim=trim
    )
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    probs = probs * valid[:, None, None, None, None]
    if windows is not None:
        wz, wy, wx = windows
        probs = probs * (
            wz[None, :, None, None, None]
            * wy[None, None, :, None, None]
            * wx[None, None, None, :, None]
        )
    return jnp.moveaxis(probs, -1, 1)


def _scatter_add(acc, probs, starts, trim):
    """Sequential read-add-write of each trimmed patch into the
    accumulator (patches within a batch may overlap, so no vmap)."""
    block = probs.shape[1:]

    def add_one(i, acc):
        st = starts[i] + trim
        idx = (jnp.int32(0), st[0], st[1], st[2])
        cur = jax.lax.dynamic_slice(acc, idx, block)
        return jax.lax.dynamic_update_slice(acc, cur + probs[i], idx)

    return jax.lax.fori_loop(0, probs.shape[0], add_one, acc)


def accumulate_core(
    variables,
    volume,
    starts,
    valid,
    *,
    module,
    patch_shape,
    trim,
    batch_size,
    out_channels,
    vma_axes=(),
    windows=None,
):
    """Traceable accumulate loop (shared by the jit and shard_map paths).

    ``vma_axes``: mesh axis names to mark the accumulator as varying
    over when tracing inside ``shard_map`` (JAX >= 0.8 varying-manual-
    axes typing requires the scan carry to match its updates).

    ``windows``: optional per-axis 1-D float32 arrays multiplied into
    each patch's trimmed core (gaussian blend mode), mirroring
    :func:`forward_batch`.

    Parameters
    ----------
    volume : (D, H, W) float32 array, already normalized + grid-padded.
    starts : (N, 3) int32 patch starts into ``volume``; N must be a
        multiple of ``batch_size`` (pad with any in-bounds start).
    valid : (N,) float32 mask, 0.0 for padded starts.

    Returns
    -------
    (out_channels, D, H, W) float32 accumulated (unweighted) predictions.
    """
    n = starts.shape[0]
    assert n % batch_size == 0
    acc = jnp.zeros((out_channels,) + volume.shape, jnp.float32)
    if vma_axes:
        acc = jax.lax.pcast(acc, tuple(vma_axes), to="varying")

    def batch_step(acc, batch):
        b_starts, b_valid = batch
        probs = _forward_weighted(
            variables, volume, b_starts, b_valid, module, patch_shape,
            trim, windows,
        )
        return _scatter_add(acc, probs, b_starts, trim), None

    starts = starts.reshape(-1, batch_size, 3)
    valid = valid.reshape(-1, batch_size)
    acc, _ = jax.lax.scan(batch_step, acc, (starts, valid))
    return acc


@functools.partial(
    jax.jit, static_argnames=("module", "patch_shape", "trim")
)
def forward_batch(variables, volume, starts, valid, *, module, patch_shape,
                  trim, windows=None):
    """Gather + model forward + sigmoid + trim + validity/window mask.

    ``windows``: optional per-axis 1-D float32 arrays multiplied into
    each patch's trimmed core (gaussian blend mode). Returns
    (B, C, core, core, core) float32 weighted probabilities.
    """
    return _forward_weighted(
        variables, volume, starts, valid, module, patch_shape, trim,
        windows,
    )


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("trim",))
def scatter_batch(acc, probs, starts, *, trim):
    """Sequential read-add-write of each trimmed patch into the donated
    accumulator (patches within a batch may overlap)."""
    return _scatter_add(acc, probs, starts, trim)


def accumulate_predictions(variables, volume, starts, valid, *, module,
                           patch_shape, trim, batch_size, out_channels,
                           windows=None):
    """Single-device accumulate: Python loop over per-batch jits.

    Functionally identical (bit-exact, verified on TPU) to running
    :func:`accumulate_core` under one jit, but compiles ~2.6x faster
    (the UNet body compiles once outside the scan) and reuses the
    forward executable across slabs of the same patch/batch shape. The
    accumulator is donated between batches so no copies accumulate.
    """
    n = starts.shape[0]
    assert n % batch_size == 0
    starts = starts.reshape(-1, batch_size, 3)
    valid = valid.reshape(-1, batch_size)
    acc = jnp.zeros((out_channels,) + volume.shape, jnp.float32)
    for i in range(starts.shape[0]):
        probs = forward_batch(
            variables, volume, starts[i], valid[i], module=module,
            patch_shape=tuple(patch_shape), trim=trim, windows=windows,
        )
        acc = scatter_batch(acc, probs, starts[i], trim=trim)
    return acc


@functools.partial(jax.jit, static_argnames=())
def divide_by_weights(acc, wz, wy, wx):
    """acc / (wz x wy x wx) where the weight is nonzero, else 0."""
    w = wz[:, None, None] * wy[None, :, None] * wx[None, None, :]
    return jnp.where(w > 0, acc / jnp.where(w > 0, w, 1.0), 0.0)
