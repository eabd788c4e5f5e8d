"""Multi-process sampler fan-out (``prefetch_batches(num_workers>0)``).

The reference's torch DataLoader exposes worker processes but the
reference never enables them (reference machine_learning/train.py:103-106
creates the loader with defaults -- num_workers=0). This suite pins the
TPU rebuild's GIL-free equivalent (data_handling._prefetch_batches_mp):
strict batch ordering, bit-identity on index-deterministic datasets,
per-worker seeded determinism on draw-based samplers, error propagation,
consumer-side sticky label-wire dtype harmonization, and Trainer
integration.
"""

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu.machine_learning import (
    data_handling,
)
from tests.test_training import PATCH, make_volumes


def _drain(gen):
    return list(gen)


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for (xa, ya), (xb, yb) in zip(a, b):
        if isinstance(xa, tuple):
            assert isinstance(xb, tuple) and len(xa) == len(xb)
            for ca, cb in zip(xa, xb):
                assert ca.dtype == cb.dtype
                np.testing.assert_array_equal(ca, cb)
        else:
            assert xa.dtype == xb.dtype
            np.testing.assert_array_equal(xa, xb)
        assert ya.dtype == yb.dtype
        np.testing.assert_array_equal(ya, yb)


class TestValidateWorkers:
    def test_bit_identical_to_single_thread(self):
        """ValidateDataset is index-deterministic: worker batches must be
        BIT-IDENTICAL to iterate_batches, in the same order."""
        imgs, labs = make_volumes()
        ds = data_handling.ValidateDataset(
            imgs, labs, patch_shape=PATCH, containment_buffer=0, seed=3
        )
        want = _drain(data_handling.iterate_batches(ds, 4))
        got = _drain(data_handling.prefetch_batches(ds, 4, num_workers=2))
        assert len(want) > 1
        _assert_batches_equal(got, want)

    def test_more_workers_than_batches(self):
        imgs, labs = make_volumes()
        ds = data_handling.ValidateDataset(
            imgs, labs, patch_shape=PATCH, containment_buffer=0, seed=3
        )
        n = len(ds)
        want = _drain(data_handling.iterate_batches(ds, n))
        got = _drain(
            data_handling.prefetch_batches(ds, n, num_workers=4)
        )
        _assert_batches_equal(got, want)


class TestTrainWorkers:
    def test_deterministic_across_runs(self):
        """Same (seed, num_workers) => identical batch streams from two
        freshly built datasets, including the host augmentations."""
        imgs, labs = make_volumes()
        kw = dict(patch_shape=PATCH, seed=7, transform=True)
        a = data_handling.TrainDataset(imgs, labs, **kw)
        b = data_handling.TrainDataset(imgs, labs, **kw)
        ga = _drain(data_handling.prefetch_batches(a, 2, num_workers=2))
        gb = _drain(data_handling.prefetch_batches(b, 2, num_workers=2))
        _assert_batches_equal(ga, gb)
        # Workers draw DISTINCT per-worker streams (not clones of one
        # inherited RNG state): consecutive batches come from different
        # workers and must differ.
        assert not np.array_equal(ga[0][0], ga[1][0])

    def test_epochs_differ_but_replay(self):
        """Epoch 2's stream differs from epoch 1's (the draw round is
        folded into the worker seeds) yet replays run-to-run."""
        imgs, labs = make_volumes()
        kw = dict(patch_shape=PATCH, seed=11)
        a = data_handling.TrainDataset(imgs, labs, **kw)
        b = data_handling.TrainDataset(imgs, labs, **kw)
        a1 = _drain(data_handling.prefetch_batches(a, 2, num_workers=2))
        a2 = _drain(data_handling.prefetch_batches(a, 2, num_workers=2))
        b1 = _drain(data_handling.prefetch_batches(b, 2, num_workers=2))
        b2 = _drain(data_handling.prefetch_batches(b, 2, num_workers=2))
        _assert_batches_equal(a1, b1)
        _assert_batches_equal(a2, b2)
        assert not all(
            np.array_equal(x1, x2)
            for (x1, _), (x2, _) in zip(a1, a2)
        )

    def test_unseeded_workers_not_clones(self):
        """seed=None: forked workers must NOT inherit identical RNG
        state (the captured OS entropy re-keys each one)."""
        imgs, labs = make_volumes()
        ds = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=None
        )
        got = _drain(data_handling.prefetch_batches(ds, 2, num_workers=2))
        assert not np.array_equal(got[0][0], got[1][0])


class _ExplodingDataset:
    def __init__(self, n=8, bad=5):
        self.n, self.bad = n, bad

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        if idx == self.bad:
            raise ValueError(f"boom at {idx}")
        x = np.full((1, 4, 4, 4), float(idx), np.float32)
        return x, x


class _UnpicklableError(ValueError):
    def __init__(self):
        super().__init__("unpicklable boom")
        self.payload = lambda: None  # lambdas cannot pickle


class _UnpicklableExploder(_ExplodingDataset):
    def __getitem__(self, idx):
        if idx == self.bad:
            raise _UnpicklableError()
        return super().__getitem__(idx)


class TestWorkerFailure:
    def test_exception_propagates(self):
        gen = data_handling.prefetch_batches(
            _ExplodingDataset(), 2, num_workers=2
        )
        with pytest.raises(ValueError, match="boom at 5"):
            _drain(gen)

    def test_unpicklable_exception_still_reported(self):
        """mp.Queue pickles in a feeder thread that silently DROPS
        unpicklable payloads; the worker must pre-check and fall back
        to a repr-carrying RuntimeError instead of dying mute."""
        gen = data_handling.prefetch_batches(
            _UnpicklableExploder(), 2, num_workers=2
        )
        with pytest.raises(RuntimeError, match="unpicklable boom"):
            _drain(gen)

    def test_close_midstream_terminates_workers(self):
        imgs, labs = make_volumes()
        ds = data_handling.ValidateDataset(
            imgs, labs, patch_shape=PATCH, containment_buffer=0, seed=3
        )
        gen = data_handling.prefetch_batches(ds, 1, num_workers=2)
        next(gen)
        gen.close()  # must not hang nor leak (finally terminates workers)


class TestStickyWireDtype:
    def test_promotion_harmonized_across_workers(self):
        """A wide-label batch promotes the wire dtype for the REST of
        the stream even when later batches come from a worker that
        never saw the promotion -- the consumer upcasts (and writes the
        promotion back to the parent dataset) so the jitted step
        signature flips at most once, exactly as in-process."""
        shape = (48, 48, 48)
        rng = np.random.default_rng(0)
        wide = np.arange(1, np.prod(shape) + 1, dtype=np.uint32).reshape(
            shape
        )  # >= 2^16 distinct ids in one patch -> uint32 wire
        narrow = np.ones(shape, np.uint32)  # uint16 wire
        imgs = [rng.uniform(0, 300, shape).astype(np.float32)] * 2
        ds = data_handling.ValidateDataset(
            imgs, [wide, narrow], patch_shape=shape,
            containment_buffer=0, seed=0,
        )
        ds.wire_labels = True
        assert len(ds) == 2  # one full-volume example per volume
        want = _drain(data_handling.iterate_batches(ds, 1))
        assert [b[1].dtype for b in want] == [
            np.dtype(np.uint32), np.dtype(np.uint32)
        ]
        fresh = data_handling.ValidateDataset(
            imgs, [wide, narrow], patch_shape=shape,
            containment_buffer=0, seed=0,
        )
        fresh.wire_labels = True
        got = _drain(
            data_handling.prefetch_batches(fresh, 1, num_workers=2)
        )
        _assert_batches_equal(got, want)
        # The promotion is visible to the parent for the next epoch.
        assert fresh._label_wire_dtype == np.uint32


class TestTrainerIntegration:
    def test_prefetch_false_with_workers_rejected(self):
        import tempfile

        from aind_exaspim_neuron_segmentation_tpu.machine_learning.train import (  # noqa: E501
            Trainer,
        )

        with tempfile.TemporaryDirectory() as tmp:
            with pytest.raises(ValueError, match="prefetch=False"):
                Trainer(tmp, prefetch=False, num_workers=2)

    def test_validate_metrics_identical_any_workers(self):
        """validate_step consumes index-deterministic batches, so its
        epoch metrics are IDENTICAL for num_workers 0 and 2."""
        import tempfile

        from aind_exaspim_neuron_segmentation_tpu.machine_learning.train import (  # noqa: E501
            Trainer,
        )

        imgs, labs = make_volumes()
        val = data_handling.ValidateDataset(
            imgs, labs, patch_shape=PATCH, containment_buffer=0, seed=3
        )
        with tempfile.TemporaryDirectory() as tmp:
            tr = Trainer(
                tmp, batch_size=4, max_epochs=1, width_multiplier=0.25,
                use_amp=False, seed=0,
            )
            s0, _ = tr.validate_step(val, 0)
            tr.num_workers = 2
            tr.best_f1 = 0.0
            s2, _ = tr.validate_step(val, 0)
        assert s0["loss"] == s2["loss"]
        assert s0["precision"] == s2["precision"]
        assert s0["recall"] == s2["recall"]
        assert s0["f1"] == s2["f1"]

    def test_train_epoch_runs_with_workers(self):
        import tempfile

        from aind_exaspim_neuron_segmentation_tpu.machine_learning.train import (  # noqa: E501
            Trainer,
        )

        imgs, labs = make_volumes()
        train = data_handling.TrainDataset(
            imgs, labs, patch_shape=PATCH, seed=5
        )
        with tempfile.TemporaryDirectory() as tmp:
            tr = Trainer(
                tmp, batch_size=4, max_epochs=1, width_multiplier=0.25,
                use_amp=False, seed=0, num_workers=2,
            )
            stats = tr.train_step(train, 0)
        # update_tensorboard collapses the per-batch lists to epoch means
        assert np.isfinite(stats["loss"])
        assert stats["f1"] is not None
