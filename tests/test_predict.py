"""Sliding-window predict parity vs a host replica of the reference loop.

The replica reimplements the reference accumulation semantics
(inference.py:79-126) in NumPy, with the Flax model standing in for the
torch model on both sides -- isolating grid walking, padding, trimming,
blending, and slab streaming for comparison.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aind_exaspim_neuron_segmentation_tpu import inference
from aind_exaspim_neuron_segmentation_tpu.core import (
    add_padding,
    generate_patch_starts,
    get_patch_slices,
    normalize,
)

PATCH = (32, 32, 32)
OVERLAP = (8, 8, 8)
TRIM = 4


@pytest.fixture(scope="module")
def runner():
    return inference.load_model(
        affinity_mode=True, width_multiplier=0.25, dtype=jnp.float32
    )


def reference_predict_replica(img, runner, brightness_clip=1000):
    """Host NumPy re-statement of reference inference.py:29-126."""
    img = np.minimum(img, brightness_clip)
    img = normalize(img)
    shape5 = (1, 1) + img.shape
    acc = np.zeros((3,) + img.shape, np.float32)
    wgt = np.zeros(img.shape, np.float16)
    for start in generate_patch_starts(shape5, PATCH, OVERLAP):
        sl = get_patch_slices(start, PATCH, img.shape)
        patch = add_padding(img[sl], PATCH).astype(np.float32)
        logits = runner(patch[None, :, :, :, None])
        probs = np.asarray(jnp.moveaxis(jnp.asarray(logits), -1, 1))
        probs = 1.0 / (1.0 + np.exp(-probs[0]))
        probs = probs[:, TRIM:-TRIM, TRIM:-TRIM, TRIM:-TRIM]
        s = [si + TRIM for si in start]
        e = [min(si + p, d) for si, p, d in zip(s, probs.shape[1:], img.shape)]
        dst = (slice(None),) + tuple(slice(a, b) for a, b in zip(s, e))
        src = (slice(None),) + tuple(slice(0, b - a) for a, b in zip(s, e))
        acc[dst] += probs[src]
        wgt[tuple(dst[1:])] += 1
    np.divide(acc, wgt, out=acc, where=wgt != 0)
    return acc


@pytest.fixture(scope="module")
def volume():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 2000, size=(72, 56, 40)).astype(np.float32)


def test_predict_matches_reference_loop(runner, volume):
    want = reference_predict_replica(volume, runner)
    got = inference.predict(
        volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
        batch_size=4, verbose=False,
    )
    assert got.shape == (3,) + volume.shape
    mae = np.abs(want - got).mean()
    assert mae <= 1e-5, f"stitch MAE {mae}"
    # uncovered leading border stays exactly zero
    assert (got[:, :TRIM] == 0).all()
    assert (got[:, :, :TRIM] == 0).all()


def test_slab_streaming_identical(runner, volume):
    full = inference.predict(
        volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
        batch_size=4, verbose=False,
    )
    slabbed = inference.predict(
        volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
        batch_size=4, verbose=False, max_slab_rows=1,
    )
    np.testing.assert_allclose(slabbed, full, atol=1e-6)


def test_predict_5d_input_and_fg_mode(volume):
    fg = inference.load_model(
        affinity_mode=False, width_multiplier=0.25, dtype=jnp.float32
    )
    out = inference.predict(
        volume[None, None], fg, affinity_mode=False, patch_shape=PATCH,
        overlap=OVERLAP, trim=TRIM, batch_size=4, verbose=False,
    )
    assert out.shape == volume.shape  # fg mode returns (D, H, W)


def test_channel_mismatch_raises(runner, volume):
    with pytest.raises(ValueError, match="output channels"):
        inference.predict(
            volume, runner, affinity_mode=False, patch_shape=PATCH,
            overlap=OVERLAP, trim=TRIM, verbose=False,
        )


def test_to_tensor():
    x = np.ones((4, 4, 4), np.uint16)
    t = inference.to_tensor(x)
    assert t.shape == (1, 1, 4, 4, 4) and t.dtype == jnp.float32


def test_gaussian_blend(runner, volume):
    uniform = inference.predict(
        volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
        batch_size=4, verbose=False,
    )
    gauss = inference.predict(
        volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
        batch_size=4, verbose=False, blend_mode="gaussian",
    )
    assert gauss.shape == uniform.shape
    # still a weighted average of per-patch sigmoids: bounded in [0, 1],
    # zero exactly where uniform blending is zero (same coverage)
    assert gauss.min() >= 0 and gauss.max() <= 1
    np.testing.assert_array_equal(gauss == 0, uniform == 0)
    # interior values close to uniform average (same underlying patches)
    interior = (slice(None), slice(8, -8), slice(8, -8), slice(8, -8))
    assert np.abs(gauss[interior] - uniform[interior]).mean() < 0.05


def test_unknown_blend_mode_raises(runner, volume):
    with pytest.raises(ValueError, match="blend_mode"):
        inference.predict(
            volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
            verbose=False, blend_mode="cosine",
        )


def test_streaming_zarr_output(runner, volume, tmp_path):
    want = inference.predict(
        volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
        batch_size=4, verbose=False,
    )
    handle = inference.predict(
        volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
        batch_size=4, verbose=False, max_slab_rows=1,
        out_path=str(tmp_path / "aff.zarr"),
    )
    assert handle.shape == want.shape  # lazy zarr handle
    np.testing.assert_allclose(handle[:], want, atol=1e-6)


def test_lazy_zarr_input_matches_dense(runner, volume, tmp_path):
    from aind_exaspim_neuron_segmentation_tpu import io as vio

    path = str(tmp_path / "in.zarr")
    vio.write_zarr(path, volume, chunks=(16, 16, 16))
    want = inference.predict(
        volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
        batch_size=4, verbose=False,
    )
    got = inference.predict(
        vio.read(path), runner, patch_shape=PATCH, overlap=OVERLAP,
        trim=TRIM, batch_size=4, verbose=False, max_slab_rows=1,
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("shape", [(33, 56, 40), (58, 56, 40)])
def test_multibounce_tail_reflect_parity(runner, shape):
    """Volumes whose clipped tail patch is shorter than the pad must
    match the reference's per-patch multi-bounce reflection exactly."""
    vol = np.random.default_rng(5).uniform(0, 2000, shape).astype(np.float32)
    want = reference_predict_replica(vol, runner)
    got = inference.predict(
        vol, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
        batch_size=4, verbose=False,
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_thin_volume_returns_zeros(runner):
    out = inference.predict(
        np.zeros((72, 6, 40), np.float32), runner, patch_shape=PATCH,
        overlap=OVERLAP, trim=TRIM, verbose=False,
    )
    assert out.shape == (3, 72, 6, 40) and (out == 0).all()
