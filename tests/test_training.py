"""Datasets, augmentation, and Trainer behavioral tests (tiny shapes)."""

import glob
import os

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu.machine_learning import (
    augmentation,
    data_handling,
)
from aind_exaspim_neuron_segmentation_tpu.machine_learning.train import (
    Trainer,
    batch_precision_recall,
    cosine_annealing_lr,
)

PATCH = (16, 16, 16)


def make_volumes(n=2, shape=(48, 48, 48), seed=0):
    rng = np.random.default_rng(seed)
    imgs, labs = [], []
    for k in range(n):
        lab = np.zeros(shape, np.uint32)
        lab[8:40, 8 + 4 * k: 24 + 4 * k, 8:40] = k + 1
        img = rng.uniform(0, 80, shape).astype(np.float32)
        img[lab > 0] += 400
        imgs.append(img)
        labs.append(lab)
    return imgs, labs


class TestDatasets:
    def test_train_dataset_sampling(self):
        imgs, labs = make_volumes()
        ds = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=0
        )
        assert len(ds) == 8  # 4x volumes
        x, y = ds[0]
        assert x.shape == (1,) + PATCH and x.dtype == np.float32
        assert y.shape == (3,) + PATCH  # affinity targets
        assert 0 <= x.min() and x.max() <= 1
        assert set(np.unique(y)).issubset({0.0, 1.0})

    def test_odd_patch_shape_stays_in_bounds(self):
        """Deliberate deviation from the reference's inclusive upper
        sampling bound: odd patch shapes must never overhang the
        volume (numpy would clip -> ragged batches)."""
        rng = np.random.default_rng(11)
        img = rng.uniform(0, 300, (13, 13, 13)).astype(np.float32)
        lab = (rng.uniform(0, 1, (13, 13, 13)) > 0.5).astype(np.uint32)
        ds = data_handling.TrainDataset(
            [img], [lab], patch_shape=(13, 11, 9), seed=2
        )
        for _ in range(50):
            c = ds.sample_center((13, 13, 13))
            for ci, s, d in zip(c, (13, 11, 9), (13, 13, 13)):
                assert 0 <= ci - s // 2
                assert ci - s // 2 + s <= d
            x, y = ds[0]
            assert x.shape == (1, 13, 11, 9)
            assert y.shape == (3, 13, 11, 9)

    def test_foreground_bias(self):
        imgs, labs = make_volumes()
        ds = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=1
        )
        fg = 0
        n = 40
        for _ in range(n):
            _, _, label_patch = ds.sample_patch()
            if (label_patch > 0).sum() > data_handling.FOREGROUND_MIN_VOXELS:
                fg += 1
        assert fg >= n * 0.6  # 85% bias minus rejection-failure slack

    def test_fg_bg_mode(self):
        imgs, labs = make_volumes()
        ds = data_handling.TrainDataset(
            imgs, labs, affinity_mode=False, patch_shape=PATCH, seed=0
        )
        x, y = ds[0]
        assert y.shape == (1,) + PATCH
        assert set(np.unique(y)).issubset({0.0, 1.0})

    def test_weights_proportional_to_foreground(self):
        imgs, labs = make_volumes()
        labs[1][:] = 0
        labs[1][:4, :4, :4] = 1  # tiny foreground
        ds = data_handling.TrainDataset(imgs, labs, patch_shape=PATCH)
        assert ds.wgts[0] > 0.9

    def test_validate_dataset_deterministic(self):
        imgs, labs = make_volumes()
        kwargs = dict(patch_shape=PATCH, containment_buffer=0, seed=3)
        a = data_handling.ValidateDataset(imgs, labs, **kwargs)
        b = data_handling.ValidateDataset(imgs, labs, **kwargs)
        assert a.example_ids == b.example_ids
        assert len(a) > 0
        x, y = a[0]
        assert x.shape == (1,) + PATCH and y.shape == (3,) + PATCH

    def test_validate_background_fraction(self):
        imgs, labs = make_volumes()
        ds = data_handling.ValidateDataset(
            imgs, labs, patch_shape=PATCH, containment_buffer=0
        )
        fg = sum(
            1 for i, c in ds.example_ids
            if (ds.get_patch(ds.label_masks[i], c) > 0).sum()
            > data_handling.FOREGROUND_MIN_VOXELS
        )
        bg = len(ds) - fg
        assert bg <= int(fg * 0.25)

    def test_transform_callable_is_used(self):
        imgs, labs = make_volumes()
        calls = []

        def my_transform(x, y):
            calls.append(1)
            return x, y

        ds = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, transform=my_transform, seed=0
        )
        ds[0]
        assert calls  # reference would silently ignore the callable

    def test_lazy_zarr_paths(self, tmp_path):
        from aind_exaspim_neuron_segmentation_tpu import io as vio

        imgs, labs = make_volumes(n=1)
        ip = str(tmp_path / "img.zarr")
        lp = str(tmp_path / "lab.zarr")
        vio.write_zarr(ip, imgs[0])
        vio.write_zarr(lp, labs[0])
        ds = data_handling.TrainDataset([ip], [lp], patch_shape=PATCH, seed=0)
        x, y = ds[0]
        assert x.shape == (1,) + PATCH


class TestAugmentation:
    def test_shapes_preserved(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (1, 12, 12, 12)).astype(np.float32)
        lab = (rng.uniform(0, 1, (1, 12, 12, 12)) > 0.7).astype(np.uint32)
        t = augmentation.ImageTransforms()
        out_img, out_lab = t(img, lab)
        assert out_img.shape == img.shape
        assert out_lab.shape == lab.shape

    def test_random_scale_rank_aware(self):
        """RandomScale3D accepts bare (D, H, W) patches like the other
        transforms (channel-leading arrays keep channel-0 behavior)."""
        rng = np.random.default_rng(4)
        img3 = rng.uniform(0, 1, (10, 10, 10)).astype(np.float32)
        lab3 = (rng.uniform(0, 1, (10, 10, 10)) > 0.5).astype(np.uint32)
        t = augmentation.RandomScale3D()
        oi, ol = t(img3, lab3, rng=np.random.default_rng(0))
        assert oi.shape == img3.shape and ol.shape == lab3.shape
        assert set(np.unique(ol)).issubset(set(np.unique(lab3)) | {0})
        oi4, ol4 = t(img3[None], lab3[None],
                     rng=np.random.default_rng(0))
        assert oi4.shape == (1, 10, 10, 10)
        np.testing.assert_array_equal(oi4[0], oi)  # same draw, same zoom

    def test_labels_stay_integral(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (1, 12, 12, 12)).astype(np.float32)
        lab = np.zeros((1, 12, 12, 12), np.uint32)
        lab[0, 3:9, 3:9, 3:9] = 7
        t = augmentation.ImageTransforms()
        for _ in range(5):
            _, out_lab = t(img, lab)
            assert set(np.unique(out_lab)).issubset({0, 7})  # order-0 only

    def test_flip_spatial_axes_only(self):
        img = np.zeros((1, 4, 4, 4), np.float32)
        img[0, 0, 0, 0] = 1.0

        class AlwaysFlip:
            def random(self):
                return 0.9

        flipped, _ = augmentation.RandomFlip3D()(img, img, rng=AlwaysFlip())
        assert flipped[0, 3, 3, 3] == 1.0  # all three spatial axes flipped

    def test_contrast_clips(self):
        img = np.ones((4, 4, 4), np.float32)
        out = augmentation.RandomContrast3D((1.5, 1.5))(img)
        assert out.max() <= 1.0


class TestMetrics:
    def test_precision_recall_matches_sklearn(self):
        import jax.numpy as jnp
        from sklearn.metrics import precision_score, recall_score

        rng = np.random.default_rng(0)
        logits = rng.standard_normal((4, 8, 8, 8)).astype(np.float32)
        labels = (rng.uniform(size=(4, 8, 8, 8)) > 0.5).astype(np.float32)
        p, r = batch_precision_recall(jnp.asarray(logits), jnp.asarray(labels))
        for i in range(4):
            sp = precision_score(
                labels[i].ravel() > 0, logits[i].ravel() > 0,
                zero_division=np.nan,
            )
            sr = recall_score(
                labels[i].ravel() > 0, logits[i].ravel() > 0,
                zero_division=np.nan,
            )
            np.testing.assert_allclose(float(p[i]), sp, atol=1e-6)
            np.testing.assert_allclose(float(r[i]), sr, atol=1e-6)

    def test_nan_on_empty(self):
        import jax.numpy as jnp

        logits = -np.ones((1, 4, 4, 4), np.float32)  # no positives
        labels = np.zeros((1, 4, 4, 4), np.float32)
        p, r = batch_precision_recall(jnp.asarray(logits), jnp.asarray(labels))
        assert np.isnan(float(p[0])) and np.isnan(float(r[0]))

    def test_cosine_schedule_matches_torch(self):
        import torch

        m = torch.nn.Linear(1, 1)
        opt = torch.optim.AdamW(m.parameters(), lr=1e-3)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=25)
        ours = cosine_annealing_lr(1e-3, t_max=25)
        for epoch in range(30):
            np.testing.assert_allclose(
                ours(epoch), opt.param_groups[0]["lr"], rtol=1e-6,
                err_msg=f"epoch {epoch}",
            )
            sched.step()


class TestTrainer:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        out = tmp_path_factory.mktemp("train")
        imgs, labs = make_volumes()
        train_ds = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=0
        )
        val_ds = data_handling.ValidateDataset(
            imgs, labs, patch_shape=PATCH, containment_buffer=0
        )
        trainer = Trainer(
            str(out), batch_size=4, max_epochs=2, width_multiplier=0.25,
            use_amp=False,
        )
        trainer.run(train_ds, val_ds)
        return trainer

    def test_loss_finite_and_checkpoint_written(self, trained):
        pths = glob.glob(os.path.join(trained.log_dir, "*.pth"))
        assert pths, "no best-F1 .pth checkpoint written"
        name = os.path.basename(pths[0])
        assert name.startswith("UNet3d-") and name.endswith(".pth")

    def test_pth_loads_in_torch_reference(self, trained):
        import torch

        from tests.reference_oracle import load_reference_unet3d_module

        ref = load_reference_unet3d_module()
        if ref is None:
            pytest.skip("reference unavailable")
        pth = glob.glob(os.path.join(trained.log_dir, "*.pth"))[0]
        model = ref.UNet3D(output_channels=3, width_multiplier=0.25)
        model.load_state_dict(torch.load(pth, map_location="cpu"))

    def test_resume_round_trip(self, trained, tmp_path):
        path = trained.save_train_state(str(tmp_path / "state"))
        fresh = Trainer(
            str(tmp_path), batch_size=4, max_epochs=2,
            width_multiplier=0.25, use_amp=False,
        )
        fresh.restore_train_state(path)
        assert fresh.epoch == trained.epoch + 1
        assert fresh.best_f1 == trained.best_f1
        a = np.asarray(
            trained.params["inc"]["conv1"]["kernel"]
        )
        b = np.asarray(fresh.params["inc"]["conv1"]["kernel"])
        np.testing.assert_array_equal(a, b)

    def test_tensorboard_events_written(self, trained):
        events = glob.glob(os.path.join(trained.log_dir, "events.*"))
        assert events


def make_two_blob_volumes(n=2, shape=(48, 48, 48), seed=0):
    """Two bright, well-separated boxes per volume -- a learnable
    instance-segmentation task with a known 2-segment ground truth."""
    rng = np.random.default_rng(seed)
    imgs, labs = [], []
    for k in range(n):
        lab = np.zeros(shape, np.uint32)
        lab[8:40, 6:20 + k, 8:40] = 1
        lab[8:40, 28:42, 8:40 - k] = 2
        img = rng.uniform(0, 80, shape).astype(np.float32)
        img[lab > 0] += 400
        imgs.append(img)
        labs.append(lab)
    return imgs, labs


class TestLearning:
    """The training stack must LEARN, not just run (reference
    train.py:89-121, README.md:81-117): loss decreasing by an order of
    magnitude, validation F1 reaching production-useful levels, and --
    the full loop -- a Trainer-produced best-F1 ``.pth`` driving
    ``load_model -> predict -> affinities_to_segmentation`` to a
    segmentation that beats random weights by a wide VOI margin.
    Everything is seeded; shapes are tiny (width_multiplier 0.25, 16^3
    patches) so both tests run in minutes on the 1-core CPU host."""

    def test_loss_converges_and_f1(self):
        """Seeded convergence: loss drops >= 10x and val F1 >= 0.9
        within 120 steps on the blob task (affinity mode)."""
        import tempfile

        imgs, labs = make_volumes()
        ds = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=0, transform=False
        )
        val = data_handling.ValidateDataset(
            imgs, labs, patch_shape=PATCH, containment_buffer=0
        )
        trainer = Trainer(
            tempfile.mkdtemp(), batch_size=8, max_epochs=1,
            width_multiplier=0.25, use_amp=False, lr=1e-2,
        )
        losses = []
        for epoch in range(120):
            losses.append(trainer.train_step(ds, epoch)["loss"])
            # measured headroom: ratio 14x by step 80 (BASELINE.md
            # round-5 learning proof); early-exit with margin
            if epoch >= 40 and losses[0] / min(losses) >= 12:
                break
        ratio = losses[0] / min(losses)
        assert ratio >= 10, (
            f"loss only dropped {ratio:.1f}x in {len(losses)} steps "
            f"(first={losses[0]:.4f}, best={min(losses):.4f})"
        )
        stats, _ = trainer.validate_step(val, len(losses))
        assert stats["f1"] >= 0.9, f"val F1 {stats['f1']:.3f} < 0.9"

    def test_trained_model_segments_better_than_random(self, tmp_path):
        """Full-loop quality: Trainer.run -> best-F1 .pth -> load_model
        -> predict -> affinities_to_segmentation must separate the two
        ground-truth blobs exactly (VOI ~ 0 on foreground) while random
        weights cannot tell them apart (VOI ~ ln 2)."""
        import contextlib
        import io

        from aind_exaspim_neuron_segmentation_tpu import inference

        from .test_postprocess import variation_of_information

        imgs, labs = make_two_blob_volumes()
        ds = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=0, transform=False
        )
        # a small held-out crop keeps the per-epoch validation cheap;
        # its F1 still gates the best-checkpoint export
        val = data_handling.ValidateDataset(
            [imgs[1][:32, :32, :32]], [labs[1][:32, :32, :32]],
            patch_shape=PATCH, containment_buffer=0,
        )
        trainer = Trainer(
            str(tmp_path), batch_size=8, max_epochs=60,
            width_multiplier=0.25, use_amp=False, lr=1e-2,
        )
        with contextlib.redirect_stdout(io.StringIO()):
            best_f1 = trainer.run(ds, val)
        assert best_f1 >= 0.9

        pths = glob.glob(os.path.join(trainer.log_dir, "*.pth"))
        best_pth = max(
            pths, key=lambda p: float(p.rsplit("-", 1)[1][:-4])
        )
        kw = dict(
            patch_shape=PATCH, overlap=(8, 8, 8), trim=2, batch_size=8,
            brightness_clip=300, verbose=False,
        )
        runner = inference.load_model(
            best_pth, affinity_mode=True, width_multiplier=0.25,
            dtype=np.float32,
        )
        seg = inference.affinities_to_segmentation(
            inference.predict(imgs[0], runner, **kw)
        )
        voi_trained = variation_of_information(seg, labs[0])
        # the two blobs resolve as distinct non-background segments
        assert seg[20, 12, 20] != seg[20, 35, 20]
        assert seg[20, 12, 20] > 0 and seg[20, 35, 20] > 0

        random_runner = inference.load_model(
            affinity_mode=True, width_multiplier=0.25, dtype=np.float32
        )
        seg_rand = inference.affinities_to_segmentation(
            inference.predict(imgs[0], random_runner, **kw)
        )
        voi_random = variation_of_information(seg_rand, labs[0])
        assert voi_trained < 0.05, f"trained VOI {voi_trained:.3f}"
        assert voi_random > 0.5, f"random VOI {voi_random:.3f}"
        assert voi_trained < voi_random / 4


class TestLabelWire:
    """Compact-label wire batches must change NOTHING numerically."""

    def test_compact_labels_preserve_structure(self):
        rng = np.random.default_rng(0)
        lab = rng.integers(0, 2**20, (1, 12, 12, 12)).astype(np.uint32)
        lab[0, :3] = 0
        compact = data_handling.compact_labels(lab)
        assert compact.dtype == np.uint16
        assert compact.shape == lab.shape
        # zero-preserving, equality-preserving relabel
        np.testing.assert_array_equal(compact == 0, lab == 0)
        for a, b in ((0, 1), (3, 4), (5, 11)):
            eq_old = lab[0, a] == lab[0, b]
            eq_new = compact[0, a] == compact[0, b]
            np.testing.assert_array_equal(eq_old, eq_new)

    def test_compact_labels_u64_exact(self):
        """Ids congruent mod 2^32 must stay DISTINCT (no cast alias)."""
        lab = np.zeros((1, 4, 4, 4), np.uint64)
        lab[0, 0] = 5
        lab[0, 1] = np.uint64(2**32 + 5)  # aliases 5 under a u32 cast
        lab[0, 2] = np.uint64(2**32)      # aliases 0 under a u32 cast
        compact = data_handling.compact_labels(lab)
        assert compact[0, 0, 0, 0] != compact[0, 1, 0, 0]
        assert compact[0, 2, 0, 0] != 0
        np.testing.assert_array_equal(compact == 0, lab == 0)

    def test_compact_labels_rejects_negative(self):
        lab = np.full((2, 2, 2), -3, np.int64)
        with pytest.raises(ValueError, match="negative"):
            data_handling.compact_labels(lab)

    def test_wire_dtype_promotion_is_sticky(self):
        """One dense patch promotes the wire to uint32 FOR GOOD (batch
        dtype oscillation would retrace the jitted step every flip)."""
        imgs, labs = make_volumes()
        ds = data_handling.TrainDataset(imgs, labs, patch_shape=PATCH)
        sparse = np.ones((1, 8, 8, 8), np.uint32)
        dense = np.resize(
            np.arange(2**16 + 512, dtype=np.uint32), (1, 41, 41, 41)
        )
        assert ds._compact_wire(sparse).dtype == np.uint16
        assert ds._compact_wire(dense).dtype == np.uint32
        # sticky: the sparse patch now ships uint32 too
        assert ds._compact_wire(sparse).dtype == np.uint32

    def test_device_int32_path_exact_for_wide_ids(self):
        """wire_labels=False device-augment labels must also survive
        u64 ids (bare astype(int32) would alias mod 2^32)."""
        lab_vol = np.zeros((16, 16, 16), np.uint64)
        lab_vol[:8] = 7
        lab_vol[8:] = np.uint64(2**32 + 7)
        img_vol = np.full((16, 16, 16), 100, np.uint16)
        ds = data_handling.TrainDataset(
            [img_vol], [lab_vol], patch_shape=(16, 16, 16), seed=0,
            return_label_patches=True,
        )
        ds.wire_labels = False
        _x, label = ds[0]
        assert label.dtype == np.int32
        assert label[0, 0, 0, 0] != label[0, -1, 0, 0]
        assert (label > 0).all()

    def test_device_targets_match_host(self):
        """affinity channels from compact labels == host f32 channels."""
        import jax.numpy as jnp

        from aind_exaspim_neuron_segmentation_tpu.core.affinities import (
            get_affinity_channels,
        )

        rng = np.random.default_rng(1)
        lab = (rng.integers(0, 5, (1, 10, 10, 10)) * 977).astype(
            np.uint32
        )
        want = get_affinity_channels(lab[0]).astype(np.float32)
        compact = data_handling.compact_labels(lab)
        y = jnp.moveaxis(jnp.asarray(compact), 0, -1)[None]  # NDHWC
        got = Trainer._targets_from_labels(y, affinity=True)[0]
        got = np.moveaxis(np.asarray(got), -1, 0)
        np.testing.assert_array_equal(want, got)

    @pytest.mark.parametrize("affinity_mode", [True, False])
    def test_param_digest_bit_identical(self, tmp_path, affinity_mode):
        """One seeded epoch with and without the label wire ends in
        EXACTLY the same parameters and F1."""
        import jax

        digests = []
        for wire in (False, True):
            imgs, labs = make_volumes()
            train_ds = data_handling.TrainDataset(
                imgs, labs, patch_shape=PATCH, seed=3,
                affinity_mode=affinity_mode, transform=True,
            )
            val_ds = data_handling.ValidateDataset(
                imgs, labs, patch_shape=PATCH, containment_buffer=0,
                affinity_mode=affinity_mode,
            )
            trainer = Trainer(
                str(tmp_path / f"wire{wire}"), batch_size=4,
                max_epochs=1, width_multiplier=0.25, use_amp=False,
                affinity_mode=affinity_mode, wire_labels=wire,
            )
            trainer.run(train_ds, val_ds)
            leaves = jax.tree_util.tree_leaves(trainer.params)
            digests.append((
                trainer.best_f1,
                [np.asarray(leaf).tobytes() for leaf in leaves],
            ))
            if wire:
                assert train_ds.wire_labels and val_ds.wire_labels
        assert digests[0][0] == digests[1][0]
        for a, b in zip(digests[0][1], digests[1][1]):
            assert a == b

    def test_bf16_image_wire_rounding_matches_device(self):
        """Host ml_dtypes f32->bf16 rounding == on-device XLA convert,
        so pre-rounding images on the wire changes no forward value."""
        import jax.numpy as jnp
        import ml_dtypes

        rng = np.random.default_rng(2)
        x = rng.standard_normal(4096).astype(np.float32) * rng.choice(
            [1e-8, 1.0, 1e8], 4096
        ).astype(np.float32)
        host = x.astype(ml_dtypes.bfloat16)
        dev = np.asarray(jnp.asarray(x).astype(jnp.bfloat16))
        np.testing.assert_array_equal(
            host.view(np.uint16), dev.view(np.uint16)
        )

    def test_wire_shrinks_batch_bytes(self):
        imgs, labs = make_volumes()
        ds = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=0
        )
        _, y_full = ds[0]
        ds.wire_labels = True
        _, y_wire = ds[0]
        assert y_full.dtype == np.float32 and y_full.shape[0] == 3
        assert y_wire.dtype == np.uint16 and y_wire.shape[0] == 1
        assert y_wire.nbytes * 6 == y_full.nbytes


class TestDeviceAugment:
    def test_augment_batch_properties(self):
        import jax
        import jax.numpy as jnp

        from aind_exaspim_neuron_segmentation_tpu.ops.augment_device import (
            augment_batch,
        )

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (2, 12, 12, 12, 1)).astype(np.float32)
        lab = np.zeros((2, 12, 12, 12, 1), np.int32)
        lab[:, 3:9, 3:9, 3:9] = 7
        out_img, out_lab = augment_batch(
            jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(lab),
            rotate=False,
        )
        out_img, out_lab = np.asarray(out_img), np.asarray(out_lab)
        assert out_img.shape == img.shape and out_lab.shape == lab.shape
        assert 0.0 <= out_img.min() and out_img.max() <= 1.0
        assert set(np.unique(out_lab)) == {0, 7}  # geometric only
        # flips preserve per-example foreground count
        np.testing.assert_array_equal(
            (out_lab > 0).sum(axis=(1, 2, 3, 4)),
            (lab > 0).sum(axis=(1, 2, 3, 4)),
        )

    def test_device_rotation_matches_scipy(self):
        """Device order-0 plane rotation == host rotate3d (scipy oracle)
        for every plane, multiple angles, and non-cubic shapes."""
        import jax.numpy as jnp

        from aind_exaspim_neuron_segmentation_tpu.machine_learning.augmentation import (
            rotate3d,
        )
        from aind_exaspim_neuron_segmentation_tpu.ops.augment_device import (
            _plane_rotation_indices, _rotate_plane,
        )

        rng = np.random.default_rng(7)
        vol = rng.integers(0, 1000, (13, 11, 9)).astype(np.float32)
        for axes in ((0, 1), (0, 2), (1, 2)):
            for angle in (-41.3, -17.0, 9.6, 28.7, 44.9):
                h, w = vol.shape[axes[0]], vol.shape[axes[1]]
                idx = _plane_rotation_indices(jnp.float32(angle), h, w)
                got = np.asarray(
                    _rotate_plane(jnp.asarray(vol[..., None]), idx, axes)
                )[..., 0]
                want = rotate3d(vol, angle, axes)
                mismatch = np.mean(got != want)
                # nearest-neighbor ties at exact .5 coordinates may
                # round differently; require near-exact agreement
                assert mismatch < 0.005, (axes, angle, mismatch)

    def test_augment_batch_rotation_applied(self):
        """With rotate=True, labels stay label-valued, shapes hold, and
        at least one example's foreground count changes (rotation
        resamples; flips alone never change it)."""
        import jax
        import jax.numpy as jnp

        from aind_exaspim_neuron_segmentation_tpu.ops.augment_device import (
            augment_batch,
        )

        rng = np.random.default_rng(3)
        img = rng.uniform(0, 1, (4, 12, 12, 12, 1)).astype(np.float32)
        lab = np.zeros((4, 12, 12, 12, 1), np.int32)
        lab[:, 3:9, 2:7, 4:10] = 5
        out_img, out_lab = augment_batch(
            jax.random.PRNGKey(1), jnp.asarray(img), jnp.asarray(lab)
        )
        out_img, out_lab = np.asarray(out_img), np.asarray(out_lab)
        assert out_img.shape == img.shape and out_lab.shape == lab.shape
        assert set(np.unique(out_lab)) <= {0, 5}
        counts = (out_lab > 0).sum(axis=(1, 2, 3, 4))
        assert (counts != (lab > 0).sum(axis=(1, 2, 3, 4))).any()

    def test_smooth_matches_scipy(self):
        import jax.numpy as jnp
        from scipy.ndimage import gaussian_filter

        from aind_exaspim_neuron_segmentation_tpu.ops.augment_device import (
            _smooth_one,
        )

        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (10, 10, 10, 1)).astype(np.float32)
        got = np.asarray(_smooth_one(jnp.asarray(img), jnp.float32(0.7)))
        want = gaussian_filter(img[..., 0], sigma=0.7, radius=3)
        np.testing.assert_allclose(got[..., 0], want, atol=1e-5)

    def test_raw_wire_reconstruction_matches_device(self):
        """Host reconstruct_normalized == the jitted step's f32
        reconstruction, BITWISE (convert/sub/mul/clip are all correctly
        rounded on both sides)."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        ds = data_handling.TrainDataset(
            [rng.integers(0, 1500, (40, 40, 40)).astype(np.uint16)],
            [(rng.integers(0, 3, (40, 40, 40)) * 7).astype(np.uint32)],
            patch_shape=(16, 16, 16), seed=0, return_label_patches=True,
        )
        raw, mn, inv = ds.get_raw_input_patch(0, (20, 20, 20))
        want = data_handling.reconstruct_normalized(raw, mn, inv)
        assert want.dtype == np.float32

        @jax.jit
        def device_reconstruct(x, mn, inv):
            return jnp.clip((x.astype(jnp.float32) - mn) * inv, 0.0, 1.0)

        got = np.asarray(device_reconstruct(
            jnp.asarray(raw.astype(np.uint16)), jnp.float32(mn),
            jnp.float32(inv),
        ))
        assert got.tobytes() == want.tobytes()
        # ... and ~1 ulp from the f64 get_input_patch path it stands for
        np.testing.assert_allclose(
            want, ds.get_input_patch(0, (20, 20, 20)), atol=3e-7
        )

    def test_raw_wire_param_digest_bit_identical(self, tmp_path):
        """One seeded device-augment epoch with and without the raw
        image + compact label wire ends in EXACTLY the same parameters."""
        import jax

        rng = np.random.default_rng(9)
        imgs = [
            np.clip(rng.integers(0, 80, (48, 48, 48)) + 400 * (k + 1),
                    0, 65535).astype(np.uint16)
            for k in range(2)
        ]
        labs = []
        for k in range(2):
            lab = np.zeros((48, 48, 48), np.uint32)
            lab[8:40, 8 + 4 * k: 24 + 4 * k, 8:40] = k + 1
            labs.append(lab)
        digests = []
        for wire in (False, True):
            tr = data_handling.TrainDataset(
                imgs, labs, patch_shape=PATCH, seed=3,
                return_label_patches=True,
            )
            val = data_handling.ValidateDataset(
                imgs, labs, patch_shape=PATCH, containment_buffer=0
            )
            trainer = Trainer(
                str(tmp_path / f"raw{wire}"), batch_size=4, max_epochs=1,
                width_multiplier=0.25, use_amp=False, device_augment=True,
                wire_labels=wire, seed=0,
            )
            trainer.run(tr, val)
            if wire:
                assert tr.wire_labels and tr.wire_raw_images
                x, y = tr[0]
                assert isinstance(x, tuple) and x[0].dtype == np.uint16
                assert y.dtype == np.uint16
            else:
                assert not tr.wire_raw_images
            digests.append((
                trainer.best_f1,
                [np.asarray(p).tobytes()
                 for p in jax.tree_util.tree_leaves(trainer.params)],
            ))
        assert digests[0][0] == digests[1][0]
        for a, b in zip(digests[0][1], digests[1][1]):
            assert a == b

    def test_raw_wire_ineligible_float_volumes(self, tmp_path):
        """f32 source volumes keep the f32 image wire (no u16 cast) but
        still train under device_augment + wire_labels."""
        imgs, labs = make_volumes()
        tr = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=0,
            return_label_patches=True,
        )
        trainer = Trainer(
            str(tmp_path), batch_size=4, max_epochs=1,
            width_multiplier=0.25, use_amp=False, device_augment=True,
            wire_labels=True,
        )
        trainer.train_step(tr, 0)
        assert tr.wire_labels and not tr.wire_raw_images
        x, y = tr[0]
        assert x.dtype == np.float32 and y.dtype == np.uint16

    def test_trainer_device_augment_runs(self, tmp_path):
        from aind_exaspim_neuron_segmentation_tpu.machine_learning import (
            TrainDataset, ValidateDataset,
        )
        imgs, labs = make_volumes()
        tr = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=0, return_label_patches=True
        )
        x, y = tr[0]
        assert y.dtype == np.int32 and y.shape == (1,) + PATCH
        val = data_handling.ValidateDataset(
            imgs, labs, patch_shape=PATCH, containment_buffer=0
        )
        t = Trainer(
            str(tmp_path), batch_size=4, max_epochs=1,
            width_multiplier=0.25, use_amp=False, device_augment=True,
        )
        t.run(tr, val)

    def test_device_augment_auto_default(self, tmp_path):
        """device_augment=None (the default) auto-enables on a raw
        label-patch dataset, stays off on a host-transformed one, and
        device_augment=True on an ineligible dataset fails fast."""
        imgs, labs = make_volumes()
        raw = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=0,
            return_label_patches=True,
        )
        t = Trainer(str(tmp_path / "auto"), batch_size=4, max_epochs=1,
                    width_multiplier=0.25, use_amp=False)
        assert t.device_augment is None
        t.train_step(raw, 0)
        assert t.device_augment is True

        host = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=0, transform=True
        )
        t2 = Trainer(str(tmp_path / "host"), batch_size=4, max_epochs=1,
                     width_multiplier=0.25, use_amp=False)
        t2.train_step(host, 0)
        assert not t2.device_augment

        t3 = Trainer(str(tmp_path / "force"), batch_size=4, max_epochs=1,
                     width_multiplier=0.25, use_amp=False,
                     device_augment=True)
        with pytest.raises(ValueError, match="return_label_patches"):
            t3.train_step(host, 0)

    def test_device_affinity_targets_match_host(self):
        import jax
        import jax.numpy as jnp

        from aind_exaspim_neuron_segmentation_tpu.core.affinities import (
            affinity_channels_jax, get_affinity_channels,
        )
        from aind_exaspim_neuron_segmentation_tpu.ops.augment_device import (
            _flip_one,
        )

        rng = np.random.default_rng(2)
        lab = rng.integers(0, 3, (8, 8, 8, 1)).astype(np.int32)
        img = rng.uniform(0, 1, (8, 8, 8, 1)).astype(np.float32)
        key = jax.random.PRNGKey(3)
        fi, fl = _flip_one(key, jnp.asarray(img), jnp.asarray(lab))
        # device affinity of the flipped label == host affinity of the
        # same (flipped) label -- order of flip-then-affinity preserved
        dev = np.asarray(affinity_channels_jax(np.asarray(fl)[..., 0]))
        host = get_affinity_channels(np.asarray(fl)[..., 0])
        np.testing.assert_array_equal(dev, host.astype(np.float32))


class TestPrefetch:
    def test_prefetch_batches_matches_serial(self):
        imgs, labs = make_volumes()
        ds = data_handling.TrainDataset(imgs, labs, patch_shape=PATCH, seed=3)
        serial = list(data_handling.iterate_batches(ds, 4))
        # Fresh dataset with the same seed: sampling draws must align.
        ds2 = data_handling.TrainDataset(imgs, labs, patch_shape=PATCH, seed=3)
        fetched = list(data_handling.prefetch_batches(ds2, 4))
        assert len(serial) == len(fetched)
        for (xa, ya), (xb, yb) in zip(serial, fetched):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)

    def test_prefetch_propagates_errors(self):
        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            list(data_handling.prefetch_batches(Bad(), 2))

    def test_trainer_prefetch_matches_serial(self, tmp_path):
        """Same data, same seeds: prefetch must not change training."""
        import jax

        imgs, labs = make_volumes()
        results = {}
        for prefetch in (False, True):
            tr = data_handling.TrainDataset(
                imgs, labs, patch_shape=PATCH, seed=1
            )
            val = data_handling.ValidateDataset(
                imgs, labs, patch_shape=PATCH, containment_buffer=0
            )
            t = Trainer(
                str(tmp_path / f"p{prefetch}"), batch_size=4, max_epochs=1,
                width_multiplier=0.25, use_amp=False, prefetch=prefetch,
            )
            t.run(tr, val)
            results[prefetch] = jax.tree_util.tree_leaves(t.params)
        for a, b in zip(results[False], results[True]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert hasattr(t, "input_wait_s")
