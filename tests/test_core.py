"""Golden tests for core patch-grid / normalize / affinity numerics.

Golden values derive from facts verified against the reference in
SURVEY.md section 3.1 (grid arithmetic) and section 2 C9 (affinity and
normalize semantics).
"""

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu.core import (
    add_padding,
    affinity_channels_jax,
    blend_weight_map,
    count_patches,
    generate_patch_starts,
    get_affinity_channels,
    get_affinity_mask,
    get_patch,
    get_patch_slices,
    get_slices,
    is_contained,
    normalize,
)
from aind_exaspim_neuron_segmentation_tpu.core.patches import (
    blend_weight_map,
    patch_starts_array,
)
from aind_exaspim_neuron_segmentation_tpu.core.normalize import normalize_jax


class TestPatchGrid:
    def test_count_default_1024(self):
        # 1024^3, patch 96, overlap 32 -> stride 64 -> 16 starts/axis (SURVEY 3.1)
        shape = (1, 1, 1024, 1024, 1024)
        assert count_patches(shape, (96, 96, 96), (32, 32, 32)) == 16**3

    def test_starts_match_reference_range(self):
        # reference: range(0, d - ps + s, s) per axis, itertools.product order
        shape = (1, 1, 200, 96, 160)
        starts = list(generate_patch_starts(shape, (96, 96, 96), (32, 32, 32)))
        z = list(range(0, 200 - 96 + 64, 64))  # [0, 64, 128]
        y = list(range(0, 96 - 96 + 64, 64))  # [0]
        x = list(range(0, 160 - 96 + 64, 64))  # [0, 64]
        assert z == [0, 64, 128] and y == [0] and x == [0, 64]
        expect = [(a, b, c) for a in z for b in y for c in x]
        assert starts == expect
        assert count_patches(shape, (96, 96, 96), (32, 32, 32)) == len(expect)

    def test_last_patch_overhangs(self):
        # start 128 + 96 = 224 > 200: overhang allowed, clipped downstream
        sl = get_patch_slices((128, 0, 0), (96, 96, 96), (200, 96, 160))
        assert sl[0] == slice(128, 200)
        assert sl[1] == slice(0, 96)

    def test_3d_shape_accepted(self):
        assert count_patches((200, 96, 160), (96,) * 3, (32,) * 3) == 6

    def test_add_padding_reflects(self):
        patch = np.arange(4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4)
        padded = add_padding(patch[:3, :, :], (4, 4, 4))
        assert padded.shape == (4, 4, 4)
        # reflect: new plane 3 mirrors plane 1 (np.pad 'reflect' semantics)
        np.testing.assert_array_equal(padded[3], patch[1])
        # no-op when already full size returns input unchanged
        assert add_padding(patch, (4, 4, 4)) is patch

    def test_get_slices_center_based(self):
        s = get_slices((10, 20, 30), (4, 5, 6))
        assert s == (slice(8, 12), slice(18, 23), slice(27, 33))

    def test_get_patch_3d_vs_5d(self):
        vol3 = np.arange(1000).reshape(10, 10, 10)
        vol5 = vol3[None, None]
        c, s = (5, 5, 5), (4, 4, 4)
        np.testing.assert_array_equal(
            get_patch(vol3, c, s), get_patch(vol5, c, s)
        )

    def test_is_contained_buffer(self):
        assert is_contained((5, 5, 5), (10, 10, 10), buffer=4)
        assert not is_contained((5, 5, 5), (10, 10, 10), buffer=5)
        assert not is_contained((0, 5, 5), (10, 10, 10), buffer=1)

    def test_blend_weight_map_matches_scatter(self):
        # brute-force scatter-add of ones, mirroring the reference loop
        shape, patch, ov, trim = (160, 96, 160), (96, 96, 96), (32, 32, 32), 8
        wgt = np.zeros(shape, dtype=np.int32)
        for st in generate_patch_starts(shape, patch, ov):
            lo = [min(s + trim, d) for s, d in zip(st, shape)]
            hi = [min(s + p - trim, d) for s, p, d in zip(st, patch, shape)]
            wgt[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] += 1
        np.testing.assert_array_equal(
            blend_weight_map(shape, patch, ov, trim), wgt
        )
        # first trim voxels along each axis never covered (SURVEY 3.1)
        assert (wgt[:8] == 0).all() and (wgt[:, :8] == 0).all()

    def test_patch_starts_array(self):
        arr = patch_starts_array((200, 96, 160), (96,) * 3, (32,) * 3)
        assert arr.shape == (6, 3) and arr.dtype == np.int32


class TestNormalize:
    def test_golden(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 5000, size=(32, 32, 32))
        mn, mx = np.percentile(img, (1, 99.9))
        expect = np.clip((img - mn) / (mx - mn + 1e-8), 0, 1)
        np.testing.assert_allclose(normalize(img), expect)

    def test_no_clip(self):
        img = np.linspace(-10, 10, 1000).reshape(10, 10, 10)
        out = normalize(img, apply_clip=False)
        assert out.min() < 0 or out.max() > 1

    def test_jax_matches_numpy(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 3000, size=(24, 24, 24)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(normalize_jax(img)), normalize(img), atol=2e-5
        )


class TestAffinities:
    def test_semantics_1d_edge(self):
        # aff[v] = 1 iff label[v] == label[v+e] != 0, trailing pad 0
        lab = np.zeros((1, 1, 6), dtype=np.int64)
        lab[0, 0] = [0, 3, 3, 0, 5, 5]
        aff = get_affinity_mask(lab, (0, 0, 1))
        np.testing.assert_array_equal(aff[0, 0], [0, 1, 0, 0, 1, 0])

    def test_channels_shape_and_dtype(self):
        lab = np.random.default_rng(2).integers(0, 3, size=(5, 6, 7))
        ch = get_affinity_channels(lab)
        assert ch.shape == (3, 5, 6, 7)
        assert ch.dtype == np.float64  # np.zeros default, reference parity

    def test_boundary_between_segments_is_zero(self):
        lab = np.zeros((4, 4, 4), dtype=np.int32)
        lab[:2] = 1
        lab[2:] = 2
        ch = get_affinity_channels(lab)
        assert (ch[0][1] == 0).all()  # z-edge between segment 1 and 2
        assert (ch[0][0] == 1).all()  # interior of segment 1
        assert (ch[0][3] == 0).all()  # trailing pad plane

    def test_jax_matches_numpy(self):
        lab = np.random.default_rng(3).integers(0, 4, size=(8, 9, 10))
        np.testing.assert_array_equal(
            np.asarray(affinity_channels_jax(lab)),
            get_affinity_channels(lab).astype(np.float32),
        )

    def test_jax_matches_numpy_negative_edges(self):
        """The host path supports -e unit edges; the device path must
        agree instead of crashing on the axis lookup."""
        lab = np.random.default_rng(5).integers(0, 4, size=(6, 7, 8))
        edges = ((-1, 0, 0), (0, -1, 0), (0, 0, -1))
        np.testing.assert_array_equal(
            np.asarray(affinity_channels_jax(lab, edges=edges)),
            get_affinity_channels(lab, edges=edges).astype(np.float32),
        )

    def test_jax_rejects_non_unit_edges(self):
        import pytest

        with pytest.raises(ValueError, match="unit edge"):
            affinity_channels_jax(np.zeros((2, 2, 2), np.int32),
                                  edges=((0, 0, 2),))


class TestOffsetMasks:
    def test_shifted_views(self):
        from aind_exaspim_neuron_segmentation_tpu.core import get_offset_masks

        lab = np.arange(3 * 4 * 5).reshape(3, 4, 5)
        for edge, sl1, sl2 in (
            ((1, 0, 0), np.s_[1:, :, :], np.s_[:-1, :, :]),
            ((0, 1, 0), np.s_[:, 1:, :], np.s_[:, :-1, :]),
            ((0, 0, 1), np.s_[:, :, 1:], np.s_[:, :, :-1]),
        ):
            o1, o2 = get_offset_masks(lab, edge)
            np.testing.assert_array_equal(o1, lab[sl1])
            np.testing.assert_array_equal(o2, lab[sl2])
