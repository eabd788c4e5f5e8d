"""End-to-end pipeline: random-weight UNet -> predict -> segmentation ->
zipped SWC (BASELINE.json configs #1-#3, scaled to CPU-testable size)."""

import zipfile

import numpy as np

import jax.numpy as jnp

from aind_exaspim_neuron_segmentation_tpu import inference
from aind_exaspim_neuron_segmentation_tpu.core import get_affinity_channels


def synthetic_volume(shape=(64, 64, 64), seed=0):
    """Bright tube-like structures on noisy background + labels."""
    rng = np.random.default_rng(seed)
    lab = np.zeros(shape, np.int32)
    lab[10:54, 14:22, 10:54] = 1
    lab[10:54, 40:48, 10:54] = 2
    img = rng.uniform(0, 120, shape).astype(np.float32)
    img[lab > 0] += rng.uniform(600, 1400, (lab > 0).sum()).astype(np.float32)
    return img, lab


def test_full_pipeline(tmp_path):
    img, lab = synthetic_volume()
    model = inference.load_model(
        affinity_mode=True, width_multiplier=0.25, dtype=jnp.float32
    )
    aff = inference.predict(
        img, model, patch_shape=(32, 32, 32), overlap=(8, 8, 8), trim=4,
        batch_size=4, verbose=False,
    )
    assert aff.shape == (3,) + img.shape
    assert np.isfinite(aff).all() and aff.min() >= 0 and aff.max() <= 1

    # Random weights don't produce meaningful affinities; splice in the
    # oracle affinities for the segmentation + skeleton stages so the
    # pipeline contract (shapes, dtypes, file outputs) is exercised
    # end-to-end deterministically.
    oracle = get_affinity_channels(lab).astype(np.float32)
    seg = inference.affinities_to_segmentation(oracle, min_segment_size=50)
    assert set(np.unique(seg)) == {0, 1, 2}

    zip_path = tmp_path / "out.zip"
    skels = inference.segmentation_to_zipped_swcs(seg, str(zip_path))
    with zipfile.ZipFile(zip_path) as zf:
        assert sorted(zf.namelist()) == ["1.swc", "2.swc"]
    vox = inference.voxelize_skeletons(skels, seg.shape)
    ids = set(np.unique(vox).tolist()) - {0}
    assert ids == {1, 2}
    for i in ids:
        assert (seg[vox == i] == i).all()


def test_train_export_reload_predict(tmp_path):
    """Close the reference workflow loop: Trainer -> best-F1 .pth ->
    load_model -> predict (README training + inference workflows)."""
    import glob

    from aind_exaspim_neuron_segmentation_tpu.machine_learning import (
        TrainDataset, ValidateDataset, Trainer,
    )

    img, lab = synthetic_volume(shape=(48, 48, 48))
    train_ds = TrainDataset([img], [lab], patch_shape=(16, 16, 16), seed=0)
    val_ds = ValidateDataset(
        [img], [lab], patch_shape=(16, 16, 16), containment_buffer=0
    )
    trainer = Trainer(
        str(tmp_path), batch_size=4, max_epochs=1, width_multiplier=0.25,
        use_amp=False,
    )
    trainer.run(train_ds, val_ds)
    paths = glob.glob(str(tmp_path / "session-*" / "*.pth"))
    assert paths, "training produced no best-F1 checkpoint (F1 stayed 0)"
    pth = paths[0]

    model = inference.load_model(
        pth, affinity_mode=True, width_multiplier=0.25, dtype=jnp.float32
    )
    aff = inference.predict(
        img, model, patch_shape=(16, 16, 16), overlap=(4, 4, 4), trim=2,
        batch_size=4, verbose=False,
    )
    assert aff.shape == (3, 48, 48, 48)
    assert np.isfinite(aff).all()


def test_sharded_zarr_to_swc_pipeline(tmp_path):
    """BASELINE config #5 at test scale: Zarr volume -> mesh-sharded
    predict -> segmentation -> zipped SWC."""
    from aind_exaspim_neuron_segmentation_tpu import io as vio, parallel

    img, lab = synthetic_volume(shape=(64, 48, 48))
    in_path = str(tmp_path / "brain.zarr")
    vio.write_zarr(in_path, img, chunks=(16, 16, 16))
    model = inference.load_model(
        affinity_mode=True, width_multiplier=0.25, dtype=jnp.float32
    )
    handle = vio.read(in_path)
    aff = parallel.predict_sharded(
        handle[:], model, mesh=parallel.make_mesh(4),
        patch_shape=(32, 32, 32), overlap=(8, 8, 8), trim=4, batch_size=4,
    )
    assert aff.shape == (3, 64, 48, 48)
    # oracle affinities for deterministic downstream (random weights)
    oracle = get_affinity_channels(lab).astype(np.float32)
    seg = inference.affinities_to_segmentation(oracle, min_segment_size=50)
    zip_path = str(tmp_path / "out.zip")
    inference.segmentation_to_zipped_swcs(seg, zip_path)
    with zipfile.ZipFile(zip_path) as zf:
        assert len(zf.namelist()) == 2
