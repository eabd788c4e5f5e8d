"""Trilinear x2 upsampling with ``align_corners=True`` semantics.

Matches ``torch.nn.Upsample(scale_factor=2, mode="trilinear",
align_corners=True)`` (reference: machine_learning/unet3d.py:247-250)
bit-for-bit in float32: output position ``i`` samples the input at
``i * (n - 1) / (2n - 1)``.

TPU-first design: instead of gathers, each spatial axis is resampled by a
dense ``(2n, n)`` interpolation matrix contracted with ``jnp.einsum`` --
three small matmuls that XLA places on the MXU and fuses with surrounding
elementwise work, rather than VPU gather traffic.
"""

import functools

import jax

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense (n_out, n_in) linear-interp matrix, align_corners=True."""
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    if n_out == 1:
        # align_corners with a single output samples position 0
        mat = np.zeros((1, n_in), dtype=np.float32)
        mat[0, 0] = 1.0
        return mat
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    mat[np.arange(n_out), lo] += 1.0 - frac
    mat[np.arange(n_out), hi] += frac
    return mat.astype(np.float32)


def linear_resize_axis(x, axis: int, n_out: int, out_range=None):
    """Resize one axis by dense-matrix contraction (align_corners=True).

    ``out_range=(lo, hi)`` computes only output rows ``lo:hi`` of the
    full ``n_out``-row resize -- exactly the corresponding rows of the
    interpolation matrix, so each produced value is bit-identical to the
    same row of the full resize (valid-region decoding, see
    ``models.unet3d.UNet3D`` ``valid_trim``).

    Formulation note (measured on TPU v5e, 48^3 x 32ch bf16): standalone,
    an in-place einsum (``bdhic,oi->bdhoc``) is 7.7x faster than this
    moveaxis round-trip -- but *inside the full UNet forward* the in-place
    form makes XLA pick layouts that double total runtime (230 ms vs
    112 ms at B=8). XLA canonicalizes the moveaxis form well in context,
    so it stays.
    """
    n_in = x.shape[axis]
    if n_in == n_out and out_range is None:
        return x
    mat_np = _interp_matrix(n_in, n_out)
    if out_range is not None:
        lo, hi = out_range
        mat_np = mat_np[lo:hi]
    mat = jnp.asarray(mat_np, dtype=x.dtype)
    # float32 path: HIGHEST keeps parity with torch bit-for-bit. bfloat16
    # path: native MXU precision -- HIGHEST there would force a multi-pass
    # f32 emulation of an op whose inputs are already low-precision.
    precision = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("...i,oi->...o", moved, mat, precision=precision)
    return jnp.moveaxis(out, -1, axis)


def trilinear_upsample_x2(x, out_ranges=None):
    """x2 upsample of NDHWC input on the three spatial axes (1, 2, 3).

    ``out_ranges``: optional per-spatial-axis ``(lo, hi)`` tuples (or
    None) selecting output rows of the doubled axis -- each value equals
    the same position of the full upsample bit-for-bit.
    """
    for i, axis in enumerate((1, 2, 3)):
        rng = out_ranges[i] if out_ranges is not None else None
        x = linear_resize_axis(x, axis, 2 * x.shape[axis], out_range=rng)
    return x
