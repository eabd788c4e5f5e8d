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

Arbitrary-angle rotation (order-0 resampling) stays on host: a gather
per voxel is VPU-hostile and the reference's nearest-neighbor semantics
don't vectorize into MXU work.
"""

import jax
import jax.numpy as jnp

NOISE_MAX_STD = 0.16
SMOOTH_MAX_SIGMA = 0.8
CONTRAST_RANGE = (0.8, 1.2)
_SMOOTH_RADIUS = 3  # matches scipy's int(4 * sigma_max + 0.5) at 0.8


def _flip_one(key, img, label):
    """Flip one (D, H, W, C) example on each spatial axis with p=0.5."""
    bits = jax.random.bernoulli(key, 0.5, (3,))
    for axis in range(3):
        img = jnp.where(bits[axis], jnp.flip(img, axis=axis), img)
        label = jnp.where(bits[axis], jnp.flip(label, axis=axis), label)
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
    k_coin, k_sigma, k_noise, k_contrast = jax.random.split(key, 4)
    use_noise = jax.random.bernoulli(k_coin, 0.5)

    noise_std = jax.random.uniform(k_sigma, (), minval=0.0,
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


def augment_batch(key, img, label):
    """Augment a (B, D, H, W, C) image/label batch on device.

    Returns (img, label); labels only undergo the geometric flips.
    """
    batch = img.shape[0]
    # split with a tuple shape handles both legacy uint32 and new-style
    # typed keys (a flat split + reshape assumes the legacy layout).
    keys = jax.random.split(key, (2, batch))
    img, label = jax.vmap(_flip_one)(keys[0], img, label)
    img = jax.vmap(_intensity_one)(keys[1], img)
    return img, label
