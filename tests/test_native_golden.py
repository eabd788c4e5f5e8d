"""Golden fixtures + fork-behavior property tests for the native engines.

The reference's segmentation/skeletonization outputs are defined by the
waterz and kimimaro binaries (reference inference.py:224-233, 272-291),
which are not installable here. These tests pin the in-tree engines'
behavior two ways:

* **Golden regression**: committed fixtures
  (tests/fixtures/agglomerate_golden.npz) freeze watershed fragments and
  per-threshold agglomerations across quantile settings bit-exactly, so
  any change to scoring, tie-breaking, or threading order is caught.
* **Property pins**: the specific waterz-fork behaviors this rebuild
  ASSUMES (documented in PARITY.md "waterz-fork behavior assumptions")
  are asserted directly: bin-midpoint quantile scoring with 256 bins,
  merge-when-score-equals-threshold, watershed steepest-neighbor
  tie-breaking by edge enumeration order, and TEASAR invalidation-radius
  scaling.
"""

import os

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu import native
from aind_exaspim_neuron_segmentation_tpu.postprocess import skeleton

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "agglomerate_golden.npz"
)


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


class TestGoldenRegression:
    def test_watershed_fragments(self, golden):
        got = native.watershed(golden["aff"])
        np.testing.assert_array_equal(got, golden["watershed"])

    def test_watershed_threshold_variants(self, golden):
        got = native.watershed(golden["aff"], 0.5, 0.95)
        np.testing.assert_array_equal(got, golden["watershed_low05_high95"])

    @pytest.mark.parametrize("q", [50, 85, 95])
    def test_agglomeration_quantiles(self, golden, q):
        got = native.agglomerate_all(
            golden["aff"], list(golden["thresholds"]), quantile_pct=q
        )
        np.testing.assert_array_equal(got, golden[f"segs_q{q}"])

    def test_quantiles_give_distinct_trajectories(self, golden):
        """Sanity that the fixtures actually exercise the scoring knob:
        at the middle threshold the three quantiles merge differently."""
        counts = [
            len(np.unique(golden[f"segs_q{q}"][1])) for q in (50, 85, 95)
        ]
        assert len(set(counts)) == 3, counts


class TestMergeAtThreshold:
    """waterz semantics: an edge merges while score <= threshold; the
    snapshot for threshold t is taken the moment the next score exceeds
    t. Score = 1 - (bin + 0.5)/256 with bin = floor(aff * 256)."""

    def _two_fragment_volume(self, boundary_aff):
        aff = np.zeros((3, 1, 1, 4), np.float32)
        aff[2, 0, 0, 0] = 1.0  # x0-x1 seeded (>= high)
        aff[2, 0, 0, 2] = 1.0  # x2-x3 seeded
        aff[2, 0, 0, 1] = boundary_aff  # the single RAG edge
        return aff

    def test_score_formula_and_equality_merge(self):
        a = 0.5
        bin_ = int(a * 256)
        score = np.float32(1.0) - np.float32((bin_ + 0.5) / 256)
        aff = self._two_fragment_volume(a)
        # exactly at the edge's score: merged
        seg_eq = native.agglomerate_all(aff, [float(score)])[0]
        labels = np.unique(seg_eq[seg_eq > 0])
        assert len(labels) == 1
        # epsilon below: snapshot happens first, NOT merged
        seg_lt = native.agglomerate_all(aff, [float(score) - 1e-4])[0]
        labels = np.unique(seg_lt[seg_lt > 0])
        assert len(labels) == 2

    def test_quantile_uses_bin_midpoint(self):
        """An edge of all-equal affinities scores by its bin midpoint,
        not the raw value: a = 0.7 falls in bin 179, so the merge
        boundary sits at 1 - 179.5/256, not at 1 - 0.7."""
        a = 0.7
        score = 1.0 - (int(a * 256) + 0.5) / 256
        aff = self._two_fragment_volume(a)
        merged = native.agglomerate_all(aff, [score + 1e-6])[0]
        assert len(np.unique(merged[merged > 0])) == 1
        unmerged = native.agglomerate_all(aff, [score - 1e-6])[0]
        assert len(np.unique(unmerged[unmerged > 0])) == 2


class TestCorruptPlanRejected:
    """Plan bytes come from spool files / digest stores, so malformed
    edge flags at volume faces must fail cleanly, not unite
    out-of-range voxels (heap corruption)."""

    def test_watershed_plan_face_crossing_dir(self):
        from aind_exaspim_neuron_segmentation_tpu import native

        plan = np.full((2, 4, 4), 8, np.uint8)  # dir=+z EVERYWHERE
        with pytest.raises(RuntimeError, match="replay"):
            native.watershed_plan(plan)  # last plane has no +z target

    def test_watershed_plan_invalid_dir_code(self):
        from aind_exaspim_neuron_segmentation_tpu import native

        plan = np.zeros((2, 4, 4), np.uint8)
        plan[0, 0, 0] = 7 << 3  # dir code 7: undefined
        with pytest.raises(RuntimeError, match="replay"):
            native.watershed_plan(plan)

    def test_streamseg_feed_face_crossing_dir(self):
        from aind_exaspim_neuron_segmentation_tpu import native

        plan = np.zeros((3, 4, 4), np.uint8)
        plan[0, 0, 0] = 5 << 3  # -y at y=0: out of the volume
        with native.StreamSegmenter((3, 4, 4)) as seg:
            with pytest.raises(RuntimeError, match="feed"):
                seg.feed(plan)


class TestRemapWrappers:
    def test_unique_retry_past_cap(self):
        """> 2^20 distinct labels exercise the grow-and-retry path."""
        from aind_exaspim_neuron_segmentation_tpu import native

        n = (1 << 20) + 4097
        lab = np.arange(n, dtype=np.uint32)
        ids, counts = native.unique(lab, return_counts=True)
        assert ids.size == n and counts.sum() == n
        np.testing.assert_array_equal(ids, lab)  # sorted

    def test_unique_small(self):
        from aind_exaspim_neuron_segmentation_tpu import native

        lab = np.array([5, 0, 5, 2, 2, 2], np.uint32)
        ids, counts = native.unique(lab, return_counts=True)
        np.testing.assert_array_equal(ids, [0, 2, 5])
        np.testing.assert_array_equal(counts, [1, 3, 2])

    def test_renumber_does_not_mutate_view_backed_input(self):
        """in_place=False must copy even when ascontiguousarray hands
        back a view over a caller-owned buffer."""
        from aind_exaspim_neuron_segmentation_tpu import native

        buf = bytearray(np.array([7, 7, 9, 0], np.uint32).tobytes())
        view = np.frombuffer(buf, np.uint32)  # base is the bytearray
        assert view.base is not None
        out, n = native.renumber(view)
        assert n == 2
        np.testing.assert_array_equal(
            np.frombuffer(buf, np.uint32), [7, 7, 9, 0]
        )
        np.testing.assert_array_equal(out, [1, 1, 2, 0])


class TestWatershedTieBreak:
    def test_steepest_tie_prefers_first_enumerated_edge(self):
        """Equal-affinity steepest candidates resolve by enumeration
        order: outgoing z, then y, then x, then incoming (strict >
        comparison keeps the first). Pinned so threading changes can
        never silently alter fragments."""
        aff = np.zeros((3, 1, 3, 3), np.float32)
        c = (0, 1, 1)
        aff[1][c] = 0.6          # outgoing y: center -> (0,2,1)  [tie]
        aff[2][c] = 0.6          # outgoing x: center -> (0,1,2)  [tie]
        aff[1][0, 1, 2] = 0.9    # (0,1,2) prefers (0,2,2)
        frags = native.watershed(aff)
        # tie resolves to the y edge: center joins (0,2,1), while the
        # x neighbor pairs with its own better match
        assert frags[0, 1, 1] == frags[0, 2, 1]
        assert frags[0, 1, 2] == frags[0, 2, 2]
        assert frags[0, 1, 1] != frags[0, 1, 2]
        assert frags[0, 0, 0] == 0  # everything else background


class TestTeasarInvalidation:
    def _tube(self):
        seg = np.zeros((9, 9, 40), np.uint32)
        zz, yy = np.meshgrid(np.arange(9), np.arange(9), indexing="ij")
        disk = (zz - 4) ** 2 + (yy - 4) ** 2 <= 9
        seg[:, :, 2:38][disk] = 1
        return seg

    def test_invalidation_radius_controls_path_count(self):
        """TEASAR invalidation ball radius = scale * DBF + const: a
        thick tube yields a single centerline under the kimimaro-default
        radii, and strictly more vertices when invalidation is tiny
        (spurious surface paths survive)."""
        seg = self._tube()
        default = skeleton.skeletonize(seg)[1]
        tiny = skeleton.skeletonize(seg, scale=0.1, const=1)[1]
        assert len(tiny.vertices) > len(default.vertices)
        # default centerline spans the tube's long axis
        xs = default.vertices[:, 2]
        assert xs.min() <= 6 and xs.max() >= 33
        # and stays near the tube core
        assert np.all(np.abs(default.vertices[:, 0] - 4) <= 2.5)
        assert np.all(np.abs(default.vertices[:, 1] - 4) <= 2.5)

    def test_soma_invalidation_parameters_respected(self):
        """A blob above the soma detection threshold gets the separate
        soma invalidation (scale, const) treatment -- more aggressive
        soma invalidation must not increase vertex count."""
        seg = np.zeros((24, 24, 24), np.uint32)
        zz, yy, xx = np.meshgrid(*(np.arange(24),) * 3, indexing="ij")
        seg[(zz - 12) ** 2 + (yy - 12) ** 2 + (xx - 12) ** 2 <= 100] = 1
        mild = skeleton.skeletonize(
            seg, soma_detection_threshold=1, soma_acceptance_threshold=1,
            soma_invalidation_scale=0.5, soma_invalidation_const=0,
        )[1]
        aggressive = skeleton.skeletonize(
            seg, soma_detection_threshold=1, soma_acceptance_threshold=1,
            soma_invalidation_scale=2.5, soma_invalidation_const=100,
        )[1]
        assert len(aggressive.vertices) <= len(mild.vertices)
