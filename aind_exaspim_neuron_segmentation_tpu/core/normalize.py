"""Brightness clipping and percentile min-max normalization.

Numerical contract mirrors reference utils/img_util.py:504-533 and the
preprocessing in reference inference.py:79-80 / data_handling.py:111-132:

    x <- min(x, brightness_clip)
    mn, mx = percentile(x, (1, 99.9))          # linear interpolation
    x <- clip((x - mn) / (mx - mn + 1e-8), 0, 1)

Both a host (numpy) and a device (jnp, jit-safe) implementation are
provided; the device path uses ``jnp.percentile`` which matches numpy's
linear-interpolation default.
"""

import jax.numpy as jnp
import numpy as np

DEFAULT_PERCENTILES = (1, 99.9)


def clip_brightness(img, brightness_clip):
    """Elementwise ``min(img, brightness_clip)`` (reference inference.py:79)."""
    return np.minimum(img, brightness_clip)


def normalize(img, apply_clip=True, percentiles=DEFAULT_PERCENTILES):
    """Percentile min-max normalize on host (reference img_util.py:504-533)."""
    mn, mx = np.percentile(img, percentiles)
    img = (img - mn) / (mx - mn + 1e-8)
    if apply_clip:
        return np.clip(img, 0, 1)
    return img


def normalize_jax(img, apply_clip=True, percentiles=DEFAULT_PERCENTILES):
    """Device-side normalize, numerically matching :func:`normalize`.

    jit-safe: percentile bounds are static. Computes in float32.
    """
    img = img.astype(jnp.float32)
    qs = jnp.percentile(img, jnp.asarray(percentiles, dtype=jnp.float32))
    mn, mx = qs[0], qs[1]
    img = (img - mn) / (mx - mn + 1e-8)
    if apply_clip:
        img = jnp.clip(img, 0.0, 1.0)
    return img


def preprocess_jax(img, brightness_clip, percentiles=DEFAULT_PERCENTILES):
    """Fused clip + normalize used by the device inference path."""
    img = jnp.minimum(img.astype(jnp.float32), float(brightness_clip))
    return normalize_jax(img, apply_clip=True, percentiles=percentiles)
