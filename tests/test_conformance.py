"""Conformance harness against the REAL waterz / kimimaro binaries.

Neither wheel is installable in this environment (no egress, no
prebuilt binaries), so every test here skips cleanly today. The day a
wheel is available, parity is one ``pip install`` away: these tests run
the committed golden fixtures through BOTH stacks and diff the results
(exact labels up to relabeling, plus VOI), settling the
verified-vs-assumed ledger in PARITY.md ("waterz-fork behavior
assumptions").

Reference invocations mirrored here:
- waterz.agglomerate(affs, thresholds, aff_threshold_low=0.1,
  aff_threshold_high=0.9999) -- reference inference.py:224-233
- kimimaro.skeletonize(seg, teasar_params={...}, anisotropy=(1,1,1),
  fix_borders=True, fill_holes=True) -- reference inference.py:272-291
"""

import os

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu import native

_GOLDEN = os.path.join(
    os.path.dirname(__file__), "fixtures", "agglomerate_golden.npz"
)


def _bijective_relabel_equal(a, b):
    """True iff labelings ``a`` and ``b`` are identical up to a
    bijective renaming of nonzero labels (zero must map to zero)."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    if a.shape != b.shape:
        return False
    if np.any((a == 0) != (b == 0)):
        return False
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    return (
        len(np.unique(pairs[:, 0])) == len(pairs)
        and len(np.unique(pairs[:, 1])) == len(pairs)
    )


def _voi(a, b):
    """Variation of information (split, merge) between two labelings,
    over the union of nonzero voxels (standard connectomics VOI)."""
    a = np.asarray(a).ravel().astype(np.int64)
    b = np.asarray(b).ravel().astype(np.int64)
    mask = (a != 0) | (b != 0)
    a, b = a[mask], b[mask]
    n = a.size
    if n == 0:
        return 0.0, 0.0
    joint, counts = np.unique(
        np.stack([a, b], axis=1), axis=0, return_counts=True
    )
    p = counts / n
    _, ca = np.unique(a, return_counts=True)
    _, cb = np.unique(b, return_counts=True)
    pa = ca / n
    pb = cb / n
    h_a = -np.sum(pa * np.log(pa))
    h_b = -np.sum(pb * np.log(pb))
    h_ab = -np.sum(p * np.log(p))
    # VOI split = H(A|B), merge = H(B|A)
    return float(h_ab - h_b), float(h_ab - h_a)


@pytest.fixture(scope="module")
def golden():
    return np.load(_GOLDEN)


class TestWaterzConformance:
    """Runs iff the real waterz wheel imports."""

    def test_agglomerate_matches_waterz(self, golden):
        waterz = pytest.importorskip("waterz")
        aff = np.ascontiguousarray(golden["aff"], np.float32)
        thresholds = [float(t) for t in golden["thresholds"]]
        theirs = list(waterz.agglomerate(
            aff.copy(), thresholds,
            aff_threshold_low=0.1, aff_threshold_high=0.9999,
        ))
        ours = native.agglomerate_all(aff, thresholds, quantile_pct=85)
        assert len(theirs) == len(ours)
        for t, ref_seg, our_seg in zip(thresholds, theirs, ours):
            split, merge = _voi(ref_seg, our_seg)
            assert _bijective_relabel_equal(ref_seg, our_seg), (
                f"threshold {t}: label mismatch vs waterz "
                f"(VOI split={split:.4f} merge={merge:.4f})"
            )

    def test_watershed_fragments_match(self, golden):
        """Fragment-level conformance isolates the zwatershed variant
        from the agglomeration scoring."""
        waterz = pytest.importorskip("waterz")
        aff = np.ascontiguousarray(golden["aff"], np.float32)
        # thresholds=[0] stops before any merge: waterz yields fragments
        theirs = next(iter(waterz.agglomerate(
            aff.copy(), [0.0],
            aff_threshold_low=0.1, aff_threshold_high=0.9999,
        )))
        ours = native.watershed(aff)
        split, merge = _voi(theirs, ours)
        assert _bijective_relabel_equal(theirs, ours), (
            f"watershed fragments differ from waterz "
            f"(VOI split={split:.4f} merge={merge:.4f})"
        )


class TestKimimaroConformance:
    """Runs iff the real kimimaro wheel imports."""

    def test_skeletonize_matches_kimimaro(self):
        kimimaro = pytest.importorskip("kimimaro")
        from aind_exaspim_neuron_segmentation_tpu import postprocess

        # Two solid tubes: deterministic, nontrivial paths.
        seg = np.zeros((40, 24, 24), np.uint32)
        seg[4:36, 4:9, 4:9] = 1
        seg[4:36, 14:20, 12:19] = 2
        params = {
            "scale": 1.25, "const": 450, "pdrf_exponent": 4,
            "pdrf_scale": 100000, "soma_detection_threshold": 1000,
            "soma_acceptance_threshold": 3500,
            "soma_invalidation_scale": 1.0,
            "soma_invalidation_const": 300, "max_paths": None,
        }
        theirs = kimimaro.skeletonize(
            seg, teasar_params=params, anisotropy=(1.0, 1.0, 1.0),
            fix_borders=True, fill_holes=True, parallel=1,
            progress=False,
        )
        ours = postprocess.skeletonize(seg, **params)
        assert set(theirs.keys()) == set(ours.keys())
        for label, ref_skel in theirs.items():
            ref_v = np.asarray(ref_skel.vertices, np.float64)
            our_v = np.asarray(ours[label].vertices, np.float64)
            # TEASAR path-order details may differ; demand the vertex
            # clouds trace the same centerline (symmetric nearest-
            # neighbor distance within the invalidation radius scale).
            d = np.linalg.norm(
                ref_v[:, None, :] - our_v[None, :, :], axis=-1
            )
            assert d.min(axis=1).max() < 3.0, f"label {label} diverges"
            assert d.min(axis=0).max() < 3.0, f"label {label} diverges"
