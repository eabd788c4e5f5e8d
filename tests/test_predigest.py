"""On-device affinity pre-digest: bit-parity with the float path.

The digest (ops/predigest.py) replaces the native watershed's pass 1a
and the RAG build's float reads (agglomerate.cpp); every test here
demands EXACT equality against the float path, including the golden
fixtures that pin the waterz-fork behavior.
"""

import numpy as np
import pytest

import jax

from aind_exaspim_neuron_segmentation_tpu import inference, native
from aind_exaspim_neuron_segmentation_tpu.ops import predigest


def _noisy_affs(shape=(24, 20, 16), seed=0):
    rng = np.random.default_rng(seed)
    aff = rng.uniform(0, 1, (3,) + shape).astype(np.float32)
    # exact-threshold and saturated values stress the f32 compares
    flat = aff.ravel()
    flat[rng.choice(aff.size, 200, replace=False)] = 0.1
    flat[rng.choice(aff.size, 100, replace=False)] = 0.9999
    flat[rng.choice(aff.size, 100, replace=False)] = 1.0
    return aff


class TestPredigestParity:
    def test_watershed_plan_matches_float(self):
        aff = _noisy_affs()
        plan, _ = predigest.predigest(aff)
        np.testing.assert_array_equal(
            native.watershed_plan(plan), native.watershed(aff)
        )

    def test_agglomerate_pre_matches_float(self):
        aff = _noisy_affs(seed=1)
        plan, qaff = predigest.predigest(aff)
        th = [0.2, 0.5, 0.8]
        np.testing.assert_array_equal(
            native.agglomerate_all_pre(plan, qaff, th),
            native.agglomerate_all(aff, th),
        )

    def test_golden_fixtures_via_predigest(self):
        import os

        g = np.load(os.path.join(
            os.path.dirname(__file__), "fixtures",
            "agglomerate_golden.npz",
        ))
        aff = np.ascontiguousarray(g["aff"], np.float32)
        plan, qaff = predigest.predigest(aff)
        np.testing.assert_array_equal(
            native.watershed_plan(plan), g["watershed"]
        )
        for q in (50, 85, 95):
            got = native.agglomerate_all_pre(
                plan, qaff, list(g["thresholds"]), quantile_pct=q
            )
            np.testing.assert_array_equal(got, g[f"segs_q{q}"])

    def test_nondefault_thresholds_in_plan(self):
        """low/high are baked into the plan at digest time."""
        aff = _noisy_affs(seed=2)
        plan, _ = predigest.predigest(aff, low=0.5, high=0.95)
        np.testing.assert_array_equal(
            native.watershed_plan(plan), native.watershed(aff, 0.5, 0.95)
        )

    def test_slab_digest_matches_whole_volume(self):
        """Streaming digest with the prev-plane handoff reproduces the
        single-call digest exactly at every slab split."""
        aff = _noisy_affs(seed=3)
        want_plan, want_q = predigest.predigest(aff)
        d = aff.shape[1]
        for split in (1, 7, 12, d - 1):
            parts_p, parts_q = [], []
            prev = None
            for lo, hi in ((0, split), (split, d)):
                p, q = predigest.predigest_slab(
                    jax.numpy.asarray(aff[:, lo:hi]), prev,
                    first_slab=(lo == 0), last_slab=(hi == d),
                )
                prev = jax.numpy.asarray(aff[0, hi - 1])
                parts_p.append(np.asarray(p))
                parts_q.append(np.asarray(q))
            np.testing.assert_array_equal(
                np.concatenate(parts_p, axis=0), want_plan,
                err_msg=f"split {split}",
            )
            np.testing.assert_array_equal(
                np.concatenate(parts_q, axis=1), want_q,
                err_msg=f"split {split}",
            )


class TestStreamingPostprocess:
    def test_streaming_digest_matches_dense(self, tmp_path):
        from aind_exaspim_neuron_segmentation_tpu.io import read
        from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
            write_zarr,
        )

        aff = _noisy_affs(seed=5)
        path = str(tmp_path / "aff.zarr")
        write_zarr(path, aff, chunks=(3, 8, 8, 8))
        lazy = read(path)
        want = predigest.predigest(aff)
        for planes in (None, 5, 1):
            got = predigest.predigest_streaming(
                lazy, slab_planes=planes
            )
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])

    def test_agglomerate_last_pre_matches_all(self):
        aff = _noisy_affs(seed=6)
        plan, qaff = predigest.predigest(aff)
        th = [0.2, 0.5, 0.8]
        np.testing.assert_array_equal(
            native.agglomerate_last_pre(plan, qaff, th),
            native.agglomerate_all_pre(plan, qaff, th)[-1],
        )

    def test_segmentation_from_lazy_zarr(self, tmp_path):
        """Beyond-RAM path regression: zarr affinity store in,
        bit-identical segmentation out vs the dense float path."""
        from aind_exaspim_neuron_segmentation_tpu.io import read
        from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
            write_zarr,
        )

        aff = _noisy_affs(shape=(32, 24, 16), seed=7)
        path = str(tmp_path / "aff.zarr")
        write_zarr(path, aff, chunks=(3, 8, 24, 16))
        seg_dense = inference.affinities_to_segmentation(aff)
        seg_lazy = inference.affinities_to_segmentation(read(path))
        np.testing.assert_array_equal(seg_dense, seg_lazy)

    def test_lazy_nondefault_thresholds(self, tmp_path):
        """Custom low/high flow into the streaming digest."""
        from aind_exaspim_neuron_segmentation_tpu.io import read
        from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
            write_zarr,
        )

        aff = _noisy_affs(shape=(20, 16, 12), seed=8)
        path = str(tmp_path / "aff2.zarr")
        write_zarr(path, aff)
        seg_dense = inference.affinities_to_segmentation(
            aff, aff_threshold_low=0.3, aff_threshold_high=0.95,
        )
        seg_lazy = inference.affinities_to_segmentation(
            read(path), aff_threshold_low=0.3, aff_threshold_high=0.95,
        )
        np.testing.assert_array_equal(seg_dense, seg_lazy)


class TestPredictPredigest:
    @pytest.fixture(scope="class")
    def runner(self):
        return inference.load_model(
            width_multiplier=0.25, dtype=jax.numpy.float32
        )

    def test_predict_predigest_matches_posthoc(self, runner):
        """predict(predigest=True), with slab streaming forced, equals
        digesting predict()'s float output -- and feeds
        affinities_to_segmentation identically."""
        rng = np.random.default_rng(4)
        vol = rng.integers(0, 1500, (40, 32, 20)).astype(np.uint16)
        kw = dict(patch_shape=(16, 16, 16), overlap=(8, 8, 4), trim=2,
                  batch_size=4, verbose=False)
        aff = inference.predict(vol, runner, **kw)
        want_plan, want_q = predigest.predigest(aff)
        for rows in (None, 2, 1):
            plan, qaff = inference.predict(
                vol, runner, predigest=True, max_slab_rows=rows, **kw
            )
            np.testing.assert_array_equal(plan, want_plan,
                                          err_msg=f"rows={rows}")
            np.testing.assert_array_equal(qaff, want_q,
                                          err_msg=f"rows={rows}")
        seg_f = inference.affinities_to_segmentation(np.asarray(aff))
        seg_p = inference.affinities_to_segmentation((plan, qaff))
        np.testing.assert_array_equal(seg_f, seg_p)

    def test_predigest_rejects_bad_combos(self, runner):
        vol = np.zeros((20, 20, 20), np.uint16)
        with pytest.raises(ValueError, match="out_path"):
            inference.predict(
                vol, runner, predigest=True, out_path="/tmp/x.zarr",
                patch_shape=(16, 16, 16), overlap=(8, 8, 8), trim=2,
                verbose=False,
            )
        with pytest.raises(ValueError, match="baked"):
            inference.affinities_to_segmentation(
                (np.zeros((4, 4, 4), np.uint8),
                 np.zeros((3, 4, 4, 4), np.uint8)),
                aff_threshold_low=0.5,
            )
