"""Slab-streaming segmentation engine: bit-parity with the dense path.

streamseg.cpp re-derives the reference pipeline (inference.py:196-237
semantics) as three Z-slab passes with O(RAG + slab) host RAM; every
test demands EXACT equality against the dense engine across slab sizes,
boundary-crossing fragments, min-size filtering, and the zarr output
contract.
"""

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu import inference, native
from aind_exaspim_neuron_segmentation_tpu.io import read
from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import write_zarr
from aind_exaspim_neuron_segmentation_tpu.postprocess.streaming import (
    segment_streaming,
)


def _noisy_affs(shape=(24, 20, 16), seed=0):
    rng = np.random.default_rng(seed)
    aff = rng.uniform(0, 1, (3,) + shape).astype(np.float32)
    flat = aff.ravel()
    flat[rng.choice(aff.size, 200, replace=False)] = 0.1
    flat[rng.choice(aff.size, 100, replace=False)] = 0.9999
    flat[rng.choice(aff.size, 100, replace=False)] = 1.0
    return aff


def _blobby_affs(shape=(40, 24, 24), r=5, seed=3, step=12):
    """Multi-component field: well-separated spheres of high affinity on
    background below the watershed low threshold, several crossing slab
    boundaries (centers on a grid with a jitter smaller than the gap)."""
    rng = np.random.default_rng(seed)
    lbl = np.zeros(shape, bool)
    zz, yy, xx = np.ogrid[-r: r + 1, -r: r + 1, -r: r + 1]
    ball = zz**2 + yy**2 + xx**2 < r**2
    for cz in range(r + 1, shape[0] - r - 1, step):
        for cy in range(r + 1, shape[1] - r - 1, step):
            for cx in range(r + 1, shape[2] - r - 1, step):
                jz, jy, jx = rng.integers(0, 3, 3)
                z0, y0, x0 = cz + jz, cy + jy, cx + jx
                lbl[z0 - r: z0 + r + 1, y0 - r: y0 + r + 1,
                    x0 - r: x0 + r + 1] |= ball
    base = np.where(lbl, np.float32(0.9), np.float32(0.02))
    aff = np.empty((3,) + shape, np.float32)
    for c in range(3):
        aff[c] = np.clip(
            base + rng.uniform(-0.05, 0.05, shape).astype(np.float32),
            0.0, 1.0,
        )
    return aff


def _lazy(tmp_path, aff, name="aff.zarr"):
    path = str(tmp_path / name)
    write_zarr(path, aff, chunks=(3, 8) + aff.shape[2:])
    return read(path)


class TestStreamSegParity:
    @pytest.mark.parametrize("slab_planes", [None, 7, 3, 1])
    def test_noisy_volume_slab_invariance(self, tmp_path, slab_planes):
        """Worst-case noise (one giant RAG component) across slab sizes."""
        aff = _noisy_affs(shape=(22, 18, 14), seed=11)
        want = inference.affinities_to_segmentation(aff)
        got = segment_streaming(
            _lazy(tmp_path, aff), slab_planes=slab_planes
        )
        np.testing.assert_array_equal(want, got)

    def test_blobby_multi_component(self, tmp_path):
        """Spheres crossing slab boundaries stitch bit-identically."""
        aff = _blobby_affs()
        want = inference.affinities_to_segmentation(aff)
        got = segment_streaming(_lazy(tmp_path, aff), slab_planes=6)
        assert want.max() > 1  # several kept segments
        np.testing.assert_array_equal(want, got)

    def test_u_shape_fragment_across_boundary(self, tmp_path):
        """A fragment spanning down and back up across a slab boundary:
        two pieces in earlier slabs union only through a later slab."""
        shape = (12, 9, 9)
        aff = np.full((3,) + shape, 0.02, np.float32)
        # Two vertical columns joined by a bar BELOW the slab boundary
        # (slab_planes=4 puts the boundary at z=4 and z=8; the bar sits
        # at z=9, so columns at (y,x)=(2,2) and (2,6) are separate
        # pieces in slabs 0 and 1, merged only by slab 2).
        aff[0, 0:10, 2, 2] = 0.95  # z-affinities along column A
        aff[0, 0:10, 2, 6] = 0.95  # column B
        aff[2, 9, 2, 2:6] = 0.95   # x-affinities joining them at z=9
        want = inference.affinities_to_segmentation(
            aff, min_segment_size=0
        )
        got = segment_streaming(
            _lazy(tmp_path, aff), slab_planes=4, min_segment_size=0
        )
        assert want.max() == 1  # one merged segment
        np.testing.assert_array_equal(want, got)

    @pytest.mark.parametrize("min_size", [0, 5, 100])
    def test_min_size_filter(self, tmp_path, min_size):
        aff = _blobby_affs(shape=(30, 20, 20), r=4, seed=9, step=10)
        want = inference.affinities_to_segmentation(
            aff, min_segment_size=min_size
        )
        got = segment_streaming(
            _lazy(tmp_path, aff), slab_planes=5,
            min_segment_size=min_size,
        )
        np.testing.assert_array_equal(want, got)

    def test_custom_thresholds_and_lowhigh(self, tmp_path):
        aff = _noisy_affs(shape=(18, 14, 12), seed=13)
        kw = dict(
            agglomeration_thresholds=(0.3, 0.7),
            aff_threshold_low=0.25, aff_threshold_high=0.9,
        )
        want = inference.affinities_to_segmentation(aff, **kw)
        got = segment_streaming(_lazy(tmp_path, aff), slab_planes=4, **kw)
        np.testing.assert_array_equal(want, got)

    def test_all_background(self, tmp_path):
        aff = np.full((3, 10, 8, 8), 0.01, np.float32)
        got = segment_streaming(_lazy(tmp_path, aff), slab_planes=3)
        assert got.dtype == np.uint32
        assert got.max() == 0

    def test_zarr_output_contract(self, tmp_path):
        """out_path streams labels to zarr and returns a lazy handle."""
        aff = _blobby_affs(shape=(24, 16, 16), r=4, seed=21, step=10)
        want = inference.affinities_to_segmentation(aff)
        out_path = str(tmp_path / "seg.zarr")
        handle = inference.affinities_to_segmentation(
            _lazy(tmp_path, aff), out_path=out_path, tmp_dir=str(tmp_path),
        )
        assert handle.shape == want.shape
        np.testing.assert_array_equal(want, np.asarray(handle[:]))

    def test_out_path_requires_lazy(self):
        aff = _noisy_affs(shape=(8, 8, 8))
        with pytest.raises(ValueError, match="lazy"):
            inference.affinities_to_segmentation(aff, out_path="/tmp/x")

    def test_low_above_high_rejected(self, tmp_path):
        aff = _noisy_affs(shape=(8, 8, 8))
        with pytest.raises(ValueError, match="low"):
            segment_streaming(
                _lazy(tmp_path, aff),
                aff_threshold_low=0.9, aff_threshold_high=0.2,
            )


class TestStreamSegmenterAPI:
    def test_call_order_enforced(self):
        seg = native.StreamSegmenter((4, 4, 4))
        plan = np.zeros((2, 4, 4), np.uint8)
        seg.feed(plan)
        with pytest.raises(RuntimeError):  # rag before fragments_done
            seg.rag_feed(np.zeros((2, 4, 4), np.uint32),
                         np.zeros((2, 3, 4, 4), np.uint8))
        with pytest.raises(RuntimeError):  # incomplete cover
            seg.fragments_done()
        seg.feed(plan)
        with pytest.raises(RuntimeError):  # overfeed
            seg.feed(plan)
        assert seg.fragments_done() == 0
        with pytest.raises(RuntimeError):  # map before merge
            seg.map(np.zeros((2, 4, 4), np.uint32))
        seg.close()

    def test_bad_shape_rejected(self):
        with pytest.raises(ValueError):
            native.StreamSegmenter((0, 4, 4))


class TestDigestStores:
    """predict(predigest=True, out_path=(p1, p2)) digest-store pipeline."""

    def test_segmentation_from_lazy_digest_pair(self, tmp_path):
        """Lazy (plan, qaff) stores -> bit-identical segmentation,
        with no device pass in the postprocess."""
        from aind_exaspim_neuron_segmentation_tpu.ops.predigest import (
            predigest,
        )

        aff = _blobby_affs(shape=(26, 18, 18), r=4, seed=31, step=10)
        plan, qaff = predigest(aff)
        pp = str(tmp_path / "plan.zarr")
        qp = str(tmp_path / "qaff.zarr")
        write_zarr(pp, plan, chunks=(6, 18, 18))
        write_zarr(qp, qaff, chunks=(3, 6, 18, 18))
        want = inference.affinities_to_segmentation(aff)
        got = inference.affinities_to_segmentation((read(pp), read(qp)))
        np.testing.assert_array_equal(want, got)

    def test_lazy_pair_rejects_nondefault_thresholds(self, tmp_path):
        from aind_exaspim_neuron_segmentation_tpu.ops.predigest import (
            predigest,
        )

        aff = _noisy_affs(shape=(8, 8, 8))
        plan, qaff = predigest(aff)
        pp, qp = str(tmp_path / "p.zarr"), str(tmp_path / "q.zarr")
        write_zarr(pp, plan)
        write_zarr(qp, qaff)
        with pytest.raises(ValueError, match="baked"):
            inference.affinities_to_segmentation(
                (read(pp), read(qp)), aff_threshold_low=0.3,
            )

    def test_predict_digest_stores_match_in_ram(self, tmp_path):
        """predict with out_path pair streams the same bytes the in-RAM
        predigest path returns."""
        runner = inference.load_model(
            affinity_mode=True, width_multiplier=0.25
        )
        rng = np.random.default_rng(0)
        vol = rng.uniform(0, 1000, (48, 40, 40)).astype(np.float32)
        kw = dict(
            patch_shape=(32, 32, 32), overlap=(16, 16, 16), trim=4,
            batch_size=2, verbose=False, predigest=True,
        )
        plan_ram, qaff_ram = inference.predict(vol, runner, **kw)
        pp = str(tmp_path / "plan.zarr")
        qp = str(tmp_path / "qaff.zarr")
        plan_h, qaff_h = inference.predict(
            vol, runner, out_path=(pp, qp), **kw
        )
        np.testing.assert_array_equal(plan_ram, np.asarray(plan_h[:]))
        np.testing.assert_array_equal(qaff_ram, np.asarray(qaff_h[:]))

    def test_predict_predigest_bad_out_path(self):
        runner = inference.load_model(
            affinity_mode=True, width_multiplier=0.25
        )
        with pytest.raises(ValueError, match="TWO stores"):
            inference.predict(
                np.zeros((40, 40, 40), np.float32), runner,
                patch_shape=(32, 32, 32), overlap=(16, 16, 16),
                predigest=True, out_path="single_path.zarr",
                verbose=False,
            )
