"""On-device batched augmentation for the jitted train step.

TPU-idiomatic counterpart of the host ``machine_learning.augmentation``
pipeline: per-example random flips of (image, label) over the three
spatial axes, then image-only intensity jitter -- a fair coin between
(gaussian noise -> contrast) and (gaussian smooth -> contrast) with the
reference's parameter ranges (sigma ~ U(0, 0.16) noise, U(0, 0.8)
smooth, contrast U(0.8, 1.2) clipped to [0, 1]; reference
augmentation.py:19-315). Everything is jit/vmap-safe and keyed by a
single PRNG key, so it fuses into the training step with zero host
work. Affinity targets are computed *after* flipping (on device via
``core.affinities.affinity_channels_jax``), which keeps edge directions
consistent -- flipping a precomputed affinity volume would not.

Arbitrary-angle rotation (reference ``RandomRotation3D``: per spatial
plane p=0.8, angle ~ U(-45, 45), order-0 resampling with grid-mirror
edges; reference augmentation.py:150-155, 319-346) runs on device as a
traced-angle gather: the output->input index map for each plane is
computed from the sampled angle inside the jit (a few thousand flops),
then applied as one flat ``jnp.take`` per plane to image and label
alike, so geometric semantics match the host pipeline exactly.
"""

import numpy as np

import jax
import jax.numpy as jnp

NOISE_MAX_STD = 0.16
SMOOTH_MAX_SIGMA = 0.8
CONTRAST_RANGE = (0.8, 1.2)
_SMOOTH_RADIUS = 3  # matches scipy's int(4 * sigma_max + 0.5) at 0.8


ROTATE_PROB = 0.8
ROTATE_MAX_DEG = 45.0


def _flip_one(key, img, label):
    """Flip one (D, H, W, C) example on each spatial axis with p=0.5."""
    bits = jax.random.bernoulli(key, 0.5, (3,))
    for axis in range(3):
        img = jnp.where(bits[axis], jnp.flip(img, axis=axis), img)
        label = jnp.where(bits[axis], jnp.flip(label, axis=axis), label)
    return img, label


def _mirror_index(t, n):
    """Fold integer indices into [0, n) with grid-mirror (scipy
    mode='grid-mirror' / numpy 'symmetric') semantics: period 2n with
    edge duplication."""
    t = jnp.mod(t, 2 * n)
    return jnp.where(t >= n, 2 * n - 1 - t, t)


def _plane_rotation_indices(angle_deg, h, w):
    """Flat (h*w,) gather map for an order-0, shape-preserving rotation.

    Matches scipy.ndimage.rotate(angle, axes=(a, b), reshape=False,
    order=0, mode='grid-mirror') as used by the host ``rotate3d``
    (machine_learning/augmentation.py): input coordinate =
    R @ (output - center) + center with R = [[cos, sin], [-sin, cos]],
    nearest sample via floor(x + 0.5), out-of-range indices grid-mirror
    folded.
    """
    rad = angle_deg * (np.pi / 180.0)
    c, s = jnp.cos(rad), jnp.sin(rad)
    ci, cj = (h - 1) / 2.0, (w - 1) / 2.0
    oi = jnp.arange(h, dtype=jnp.float32) - ci
    oj = jnp.arange(w, dtype=jnp.float32) - cj
    ii = jnp.floor(c * oi[:, None] + s * oj[None, :] + ci + 0.5)
    jj = jnp.floor(-s * oi[:, None] + c * oj[None, :] + cj + 0.5)
    ii = _mirror_index(ii.astype(jnp.int32), h)
    jj = _mirror_index(jj.astype(jnp.int32), w)
    return (ii * w + jj).reshape(-1)


def _rotate_plane(x, idx, axes):
    """Apply a flat plane-gather map to spatial axes ``axes`` of one
    (D, H, W, C) example."""
    a, b = axes
    h, w = x.shape[a], x.shape[b]
    x = jnp.moveaxis(x, (a, b), (-2, -1))
    lead = x.shape[:-2]
    x = jnp.take(x.reshape(lead + (h * w,)), idx, axis=-1)
    return jnp.moveaxis(x.reshape(lead + (h, w)), (-2, -1), (a, b))


def _rotate_one(key, img, label):
    """Reference RandomRotation3D on one (D, H, W, C) example: for each
    spatial plane in ((0,1), (0,2), (1,2)), with p=0.8 rotate image and
    label by the same U(-45, 45)-degree angle (order 0)."""
    for axes in ((0, 1), (0, 2), (1, 2)):
        key, k_coin, k_angle = jax.random.split(key, 3)
        do = jax.random.uniform(k_coin, ()) <= ROTATE_PROB
        angle = jax.random.uniform(
            k_angle, (), minval=-ROTATE_MAX_DEG, maxval=ROTATE_MAX_DEG
        )
        h, w = img.shape[axes[0]], img.shape[axes[1]]
        idx_rot = _plane_rotation_indices(angle, h, w)
        idx = jnp.where(do, idx_rot, jnp.arange(h * w))
        img = _rotate_plane(img, idx, axes)
        label = _rotate_plane(label, idx, axes)
    return img, label


def _gaussian_kernel(sigma):
    """(2R+1,) normalized kernel; degenerates to a delta as sigma -> 0."""
    offsets = jnp.arange(-_SMOOTH_RADIUS, _SMOOTH_RADIUS + 1, dtype=jnp.float32)
    safe = jnp.maximum(sigma, 1e-4)
    k = jnp.exp(-0.5 * jnp.square(offsets / safe))
    k = k / jnp.sum(k)
    delta = (offsets == 0).astype(jnp.float32)
    return jnp.where(sigma < 1e-3, delta, k)


def _smooth_one(img, sigma):
    """Separable gaussian blur of one (D, H, W, C) example.

    Edge handling matches scipy.ndimage's default mode='reflect', which
    duplicates the edge sample -- numpy/jnp call that 'symmetric'.
    """
    k = _gaussian_kernel(sigma)
    r = _SMOOTH_RADIUS
    for axis in range(3):
        pad = [(0, 0)] * img.ndim
        pad[axis] = (r, r)
        x = jnp.pad(img, pad, mode="symmetric")
        x = jnp.moveaxis(x, axis, -1)
        n = x.shape[-1] - 2 * r
        # weighted sum of shifted slices: XLA fuses the adds without
        # materializing a stacked (2R+1)-window temporary
        acc = k[0] * x[..., 0:n]
        for i in range(1, 2 * r + 1):
            acc = acc + k[i] * x[..., i: n + i]
        img = jnp.moveaxis(acc, -1, axis)
    return img


def _intensity_one(key, img):
    k_coin, k_std, k_noise, k_sigma, k_contrast = jax.random.split(key, 5)
    use_noise = jax.random.bernoulli(k_coin, 0.5)

    noise_std = jax.random.uniform(k_std, (), minval=0.0,
                                   maxval=NOISE_MAX_STD)
    noisy = img + noise_std * jax.random.normal(k_noise, img.shape)

    smooth_sigma = jax.random.uniform(k_sigma, (), minval=0.0,
                                      maxval=SMOOTH_MAX_SIGMA)
    smoothed = _smooth_one(img, smooth_sigma)

    img = jnp.where(use_noise, noisy, smoothed)
    factor = jax.random.uniform(
        k_contrast, (), minval=CONTRAST_RANGE[0], maxval=CONTRAST_RANGE[1]
    )
    return jnp.clip(img * factor, 0.0, 1.0)


def augment_batch(key, img, label, rotate=True):
    """Augment a (B, D, H, W, C) image/label batch on device.

    Returns (img, label); labels undergo only the geometric transforms
    (flips, then per-plane rotations when ``rotate`` -- the reference
    ImageTransforms geometric order, augmentation.py:145-152).
    """
    batch = img.shape[0]
    # split with a tuple shape handles both legacy uint32 and new-style
    # typed keys (a flat split + reshape assumes the legacy layout).
    keys = jax.random.split(key, (3, batch))
    img, label = jax.vmap(_flip_one)(keys[0], img, label)
    if rotate:
        img, label = jax.vmap(_rotate_one)(keys[1], img, label)
    img = jax.vmap(_intensity_one)(keys[2], img)
    return img, label
