"""Exact EDT parity vs scipy.ndimage (the available oracle)."""

import ctypes

import numpy as np
import pytest
from scipy.ndimage import distance_transform_edt

from aind_exaspim_neuron_segmentation_tpu.native import build


def edt_sq(mask, spacing):
    lib = build.load()
    lib.exa_edt_sq.restype = None
    mask = np.ascontiguousarray(mask, np.uint8)
    out = np.zeros(mask.shape, np.float32)
    lib.exa_edt_sq(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        *mask.shape,
        ctypes.c_float(spacing[0]), ctypes.c_float(spacing[1]),
        ctypes.c_float(spacing[2]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def scipy_oracle(mask, spacing):
    """scipy EDT with a 1-voxel background border (our cap semantics)."""
    padded = np.pad(mask, 1).astype(bool)
    d = distance_transform_edt(padded, sampling=spacing)
    return (d[1:-1, 1:-1, 1:-1] ** 2).astype(np.float32)


@pytest.mark.parametrize("spacing", [
    (1.0, 1.0, 1.0),
    (0.5, 0.5, 0.5),   # regression: sub-sqrt(0.5) spacings corrupted dt1d
    (2.0, 1.0, 0.3),
])
def test_edt_matches_scipy(spacing):
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(14, 13, 12)) > 0.4).astype(np.uint8)
    got = edt_sq(mask, spacing)
    want = scipy_oracle(mask, spacing)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert (got[mask == 0] == 0).all()


def test_edt_solid_block():
    mask = np.ones((9, 9, 9), np.uint8)
    got = edt_sq(mask, (1.0, 1.0, 1.0))
    want = scipy_oracle(mask, (1.0, 1.0, 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert got[4, 4, 4] == 25.0  # center: 5 units to the padded border
