"""Watershed / agglomeration / remap behavioral tests.

Synthetic-affinity oracles follow SURVEY.md section 4: two-blob and grid
label fields with known ground truth, noisy-affinity robustness, VOI
computed against ground truth.
"""

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu import inference, native, postprocess
from aind_exaspim_neuron_segmentation_tpu.core import get_affinity_channels


def perfect_affinities(labels):
    return get_affinity_channels(labels).astype(np.float32)


def variation_of_information(seg, gt):
    """VOI(seg, gt) = H(seg|gt) + H(gt|seg); 0 means identical clustering."""
    seg = seg.ravel().astype(np.int64)
    gt = gt.ravel().astype(np.int64)
    mask = gt > 0
    seg, gt = seg[mask], gt[mask]
    n = len(seg)
    joint = {}
    for s, g in zip(seg, gt):
        joint[(s, g)] = joint.get((s, g), 0) + 1
    ps = {}
    pg = {}
    for (s, g), c in joint.items():
        ps[s] = ps.get(s, 0) + c
        pg[g] = pg.get(g, 0) + c
    voi = 0.0
    for (s, g), c in joint.items():
        p = c / n
        voi -= p * (np.log(c / pg[g]) + np.log(c / ps[s]))
    return voi


class TestRemap:
    def test_unique_counts(self):
        lab = np.array([0, 0, 3, 3, 3, 9], np.uint32)
        ids, counts = native.unique(lab, return_counts=True)
        np.testing.assert_array_equal(ids, [0, 3, 9])
        np.testing.assert_array_equal(counts, [2, 3, 1])

    def test_mask_except_and_renumber(self):
        lab = np.array([4, 2, 4, 8, 0], np.uint32)
        out = native.mask_except(lab, [4])
        np.testing.assert_array_equal(out, [4, 0, 4, 0, 0])
        ren, n = native.renumber(out)
        np.testing.assert_array_equal(ren, [1, 0, 1, 0, 0])
        assert n == 1

    def test_renumber_first_appearance_order(self):
        lab = np.array([7, 3, 7, 5], np.uint32)
        ren, n = native.renumber(lab)
        np.testing.assert_array_equal(ren, [1, 2, 1, 3])
        assert n == 3

    def test_remove_small_segments_strictly_greater(self):
        lab = np.zeros((10, 10, 10), np.uint32)
        lab[:2, :5, :5] = 1  # 50 voxels
        lab[5:, :, :] = 2  # 500 voxels
        out = postprocess.remove_small_segments(lab, 100)
        assert set(np.unique(out)) == {0, 1}
        assert (out[5:] == 1).all() and (out[:2, :5, :5] == 0).all()
        # exactly min_size is dropped too (strictly greater keeps)
        lab2 = np.zeros((10, 10, 1), np.uint32)
        lab2[:10, :10, 0] = 3  # 100 voxels
        assert postprocess.remove_small_segments(lab2, 100).max() == 0


class TestWatershed:
    def test_two_blobs_perfect_affinities(self):
        lab = np.zeros((12, 12, 12), np.int32)
        lab[1:5] = 1
        lab[7:11] = 2
        ws = native.watershed(perfect_affinities(lab))
        assert (ws[lab == 0] == 0).all()
        assert len(np.unique(ws[lab == 1])) == 1
        assert len(np.unique(ws[lab == 2])) == 1
        assert ws[2, 2, 2] != ws[8, 8, 8]

    def test_low_threshold_gates_background(self):
        aff = np.full((3, 6, 6, 6), 0.05, np.float32)
        ws = native.watershed(aff, aff_threshold_low=0.1)
        assert (ws == 0).all()

    def test_high_threshold_forces_merge(self):
        aff = np.full((3, 4, 4, 4), 1.0, np.float32)
        ws = native.watershed(aff)
        assert len(np.unique(ws)) == 1  # one fragment, no background

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            native.watershed(np.zeros((2, 4, 4, 4), np.float32))


class TestAgglomerate:
    def test_generator_yields_per_threshold(self):
        lab = np.zeros((10, 10, 10), np.int32)
        lab[2:8, 2:5] = 1
        lab[2:8, 6:9] = 2
        segs = list(postprocess.agglomerate(
            perfect_affinities(lab), [0.6, 0.8, 0.9]
        ))
        assert len(segs) == 3
        for s in segs:
            assert s.shape == lab.shape and s.dtype == np.uint32

    def test_noisy_affinities_voi(self):
        # Trained-net-like affinities: foreground edges high with jitter,
        # background edges mostly below the low gate (0.1). Noise levels
        # above the low gate would bridge background for waterz too.
        rng = np.random.default_rng(0)
        lab = np.zeros((24, 24, 24), np.int32)
        lab[2:22, 2:10, 2:22] = 1
        lab[2:22, 14:22, 2:22] = 2
        aff = perfect_affinities(lab)
        fg_jitter = rng.uniform(0.55, 1.0, aff.shape).astype(np.float32)
        bg_noise = rng.uniform(0.0, 0.12, aff.shape).astype(np.float32)
        aff = np.where(aff > 0, fg_jitter, bg_noise)
        seg = inference.affinities_to_segmentation(aff, min_segment_size=20)
        voi = variation_of_information(seg, lab)
        assert voi < 0.15, f"VOI {voi} too high on noisy two-blob"
        # the two bodies must not be merged
        a = np.bincount(seg[lab == 1].ravel()).argmax()
        b = np.bincount(seg[lab == 2].ravel()).argmax()
        assert a != b and a != 0 and b != 0

    def test_threshold_monotonicity(self):
        # higher thresholds merge more: segment count non-increasing
        rng = np.random.default_rng(1)
        aff = rng.uniform(0, 1, (3, 16, 16, 16)).astype(np.float32)
        segs = list(postprocess.agglomerate(aff, [0.2, 0.5, 0.8, 0.95]))
        counts = [len(np.unique(s[s > 0])) for s in segs]
        assert all(a >= b for a, b in zip(counts, counts[1:])), counts

    def test_ascending_thresholds_required(self):
        with pytest.raises(ValueError):
            list(postprocess.agglomerate(
                np.zeros((3, 4, 4, 4), np.float32), [0.9, 0.6]
            ))

    def test_affinities_to_segmentation_surface(self):
        lab = np.zeros((16, 16, 16), np.int32)
        lab[2:14, 2:7] = 1
        lab[2:14, 9:14] = 2
        seg = inference.affinities_to_segmentation(
            perfect_affinities(lab), min_segment_size=10
        )
        assert seg.dtype == np.uint32
        ids = set(np.unique(seg).tolist())
        assert ids == {0, 1, 2}  # renumbered contiguously
        assert variation_of_information(seg, lab) < 1e-9


class TestThreadedDeterminism:
    def test_agglomerate_thread_count_invariant(self, monkeypatch):
        """The parallel watershed scan / RAG build / snapshot relabel are
        partitioned so edge numbering and sample order equal the serial
        scan -- output must be bit-identical for any EXA_NUM_THREADS."""
        from aind_exaspim_neuron_segmentation_tpu import native

        rng = np.random.default_rng(5)
        aff = rng.uniform(0, 1, (3, 30, 26, 22)).astype(np.float32)
        monkeypatch.setenv("EXA_NUM_THREADS", "1")
        base = native.agglomerate_all(aff, [0.2, 0.5, 0.8])
        for n in ("3", "8"):
            monkeypatch.setenv("EXA_NUM_THREADS", n)
            got = native.agglomerate_all(aff, [0.2, 0.5, 0.8])
            for a, b in zip(base, got):
                np.testing.assert_array_equal(a, b)

    def test_multi_component_merge_thread_invariant(self, monkeypatch):
        """Uniform-random fields collapse the RAG into ONE component, so
        the test above runs min(threads, components) = 1 merge worker.
        Isolated high-affinity blobs on below-low background give many
        components, exercising the concurrent component-parallel merge
        loop (per-worker bucket queues, scratch FlatMaps, and incident
        chunk arenas with cross-arena recycling) -- output must still be
        bit-identical for any worker count."""
        from aind_exaspim_neuron_segmentation_tpu import native

        rng = np.random.default_rng(7)
        aff = rng.uniform(0.0, 0.05, (3, 48, 48, 48)).astype(np.float32)
        for cz, cy, cx in rng.integers(6, 42, (25, 3)):
            aff[:, cz - 4:cz + 4, cy - 4:cy + 4, cx - 4:cx + 4] = (
                rng.uniform(0.3, 1.0, (3, 8, 8, 8))
            )
        monkeypatch.setenv("EXA_NUM_THREADS", "1")
        base = native.agglomerate_all(aff, [0.2, 0.5, 0.8])
        for n in ("3", "8"):
            monkeypatch.setenv("EXA_NUM_THREADS", n)
            got = native.agglomerate_all(aff, [0.2, 0.5, 0.8])
            for a, b in zip(base, got):
                np.testing.assert_array_equal(a, b)
