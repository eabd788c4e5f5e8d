"""TEASAR skeletonization + SWC round-trip tests.

``voxelize_skeletons`` (reference inference.py:313-336) is the natural
round-trip oracle per SURVEY.md section 4.
"""

import io
import zipfile

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu import inference
from aind_exaspim_neuron_segmentation_tpu.postprocess.skeleton import (
    Skeleton,
    skeletonize,
)


def tube(shape=(9, 40, 9), axis=1):
    seg = np.zeros(shape, np.uint32)
    sl = [slice(3, 6)] * 3
    sl[axis] = slice(2, shape[axis] - 2)
    seg[tuple(sl)] = 1
    return seg


class TestTeasar:
    def test_straight_tube_centerline(self):
        sk = skeletonize(tube(), const=2, scale=1.0, fix_borders=False)
        s = sk[1]
        assert len(s.radii) >= 20
        assert s.vertices[:, 1].max() - s.vertices[:, 1].min() >= 30
        # centerline stays near the tube axis (z=x=4 +- 1)
        assert np.abs(s.vertices[:, 0] - 4).max() <= 1.5
        assert np.abs(s.vertices[:, 2] - 4).max() <= 1.5
        # connected path: E = V - 1
        assert len(s.edges) == len(s.radii) - 1

    def test_two_segments_two_skeletons(self):
        seg = tube()
        seg2 = np.zeros_like(seg)
        seg2[3:6, 2:38, 3:6] = 5
        combined = np.concatenate([seg, np.zeros_like(seg), seg2], axis=2)
        sk = skeletonize(combined, const=2, scale=1.0, fix_borders=False)
        assert set(sk.keys()) == {1, 5}

    def test_l_shaped_branch(self):
        seg = np.zeros((30, 30, 9), np.uint32)
        seg[2:28, 13:16, 3:6] = 1  # vertical bar
        seg[13:16, 2:28, 3:6] = 1  # horizontal bar (crosses it)
        sk = skeletonize(seg, const=2, scale=1.0, fix_borders=False)
        s = sk[1]
        # spans both arms
        assert s.vertices[:, 0].max() - s.vertices[:, 0].min() >= 20
        assert s.vertices[:, 1].max() - s.vertices[:, 1].min() >= 20

    def test_anisotropy_scales_vertices(self):
        sk = skeletonize(
            tube(), const=2, scale=1.0, anisotropy=(2.0, 1.0, 1.0),
            fix_borders=False,
        )
        assert sk[1].vertices[:, 0].max() >= 6  # z indices ~4 scaled by 2

    def test_fill_holes(self):
        seg = np.zeros((12, 12, 12), np.uint32)
        seg[2:10, 2:10, 2:10] = 1
        seg[5:7, 5:7, 5:7] = 0  # interior cavity
        sk_filled = skeletonize(seg, const=2, scale=1.0, fill_holes=True,
                                fix_borders=False)
        assert 1 in sk_filled  # does not crash / still one skeleton

    def test_radii_reflect_thickness(self):
        sk = skeletonize(tube(), const=2, scale=1.0, fix_borders=False)
        r = sk[1].radii
        assert r.max() <= 4.0 and r.min() > 0

    def test_empty_segmentation(self):
        assert skeletonize(np.zeros((5, 5, 5), np.uint32)) == {}


class TestSwc:
    def test_round_trip(self):
        sk = skeletonize(tube(), const=2, scale=1.0, fix_borders=False)[1]
        rt = Skeleton.from_swc(sk.to_swc())
        assert len(rt.radii) == len(sk.radii)
        assert len(rt.edges) == len(sk.edges)
        # same vertex set (order may differ)
        a = set(map(tuple, np.round(sk.vertices, 3)))
        b = set(map(tuple, np.round(rt.vertices, 3)))
        assert a == b

    def test_swc_parent_structure(self):
        sk = skeletonize(tube(), const=2, scale=1.0, fix_borders=False)[1]
        lines = [ln.split() for ln in sk.to_swc().splitlines() if ln]
        assert lines[0][6] == "-1"  # exactly one root, first row
        seen = set()
        for f in lines:
            nid, parent = int(f[0]), int(f[6])
            assert parent == -1 or parent in seen
            seen.add(nid)


class TestPipelineSurface:
    def test_segmentation_to_zipped_swcs(self, tmp_path):
        seg = tube((9, 30, 9))
        zip_path = tmp_path / "skels.zip"
        skels = inference.segmentation_to_zipped_swcs(seg, str(zip_path))
        assert 1 in skels
        with zipfile.ZipFile(zip_path) as zf:
            names = zf.namelist()
            assert names == ["1.swc"]
            text = zf.read("1.swc").decode()
        assert Skeleton.from_swc(text).vertices.shape[1] == 3

    def test_voxelize_round_trip(self):
        seg = tube((9, 30, 9))
        skels = inference.skeletonize(seg)
        vol = inference.voxelize_skeletons(skels, seg.shape)
        # every rasterized skeleton voxel lies inside the segment
        hit = vol > 0
        assert hit.sum() > 0
        assert (seg[hit] == 1).all()


class TestSkeletonizeLazy:
    """Streaming per-label-crop skeletonization: bit-parity vs dense."""

    @staticmethod
    def _store(tmp_path, seg, name="labels.zarr"):
        from aind_exaspim_neuron_segmentation_tpu.io import read
        from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
            write_zarr,
        )

        path = str(tmp_path / name)
        write_zarr(path, seg, chunks=(8,) + seg.shape[1:])
        return read(path)

    @staticmethod
    def _assert_same(dense, lazy):
        assert set(dense) == set(lazy)
        for lab, skel in dense.items():
            np.testing.assert_array_equal(skel.vertices, lazy[lab].vertices)
            np.testing.assert_array_equal(skel.radii, lazy[lab].radii)
            np.testing.assert_array_equal(skel.edges, lazy[lab].edges)

    def test_multi_label_parity(self, tmp_path):
        seg = np.zeros((24, 18, 16), np.uint32)
        seg[2:22, 4, 4] = 1            # tube crossing slab boundaries
        seg[5:9, 8:16, 10] = 2         # bar
        seg[12:20, 10:14, 2:14] = 3    # slab-ish block
        seg[1, 1, 1] = 4               # single voxel at volume corner
        dense = skeletonize(seg)
        lazy = skeletonize(self._store(tmp_path, seg), slab_planes=5)
        self._assert_same(dense, lazy)

    def test_border_touching_label(self, tmp_path):
        """fix_borders semantics must follow TRUE volume faces only."""
        seg = np.zeros((16, 12, 12), np.uint32)
        seg[0:16, 5, 5] = 1   # spans the full Z extent (touches faces)
        seg[4:8, 0:4, 8] = 2  # touches the y=0 face
        dense = skeletonize(seg)
        lazy = skeletonize(self._store(tmp_path, seg), slab_planes=4)
        self._assert_same(dense, lazy)

    def test_disconnected_same_label(self, tmp_path):
        """Two components of one label merge pieces in the same order."""
        seg = np.zeros((20, 10, 10), np.uint32)
        seg[2:6, 2:6, 2:6] = 7
        seg[12:18, 3:8, 3:8] = 7
        dense = skeletonize(seg)
        lazy = skeletonize(self._store(tmp_path, seg), slab_planes=6)
        self._assert_same(dense, lazy)

    def test_single_label_black_border(self, tmp_path):
        """A store with one value everywhere flips kimimaro's
        black_border switch; the lazy scan must see it globally."""
        seg = np.ones((10, 8, 8), np.uint32)
        dense = skeletonize(seg)
        lazy = skeletonize(self._store(tmp_path, seg), slab_planes=3)
        self._assert_same(dense, lazy)

    def test_zipped_swcs_from_lazy(self, tmp_path):
        seg = np.zeros((16, 12, 12), np.uint32)
        seg[3:13, 4, 4] = 1
        seg[5:9, 7:11, 8] = 2
        zp_d = str(tmp_path / "dense.zip")
        zp_l = str(tmp_path / "lazy.zip")
        inference.segmentation_to_zipped_swcs(seg, zp_d)
        inference.segmentation_to_zipped_swcs(
            self._store(tmp_path, seg), zp_l
        )
        zd, zl = zipfile.ZipFile(zp_d), zipfile.ZipFile(zp_l)
        assert sorted(zd.namelist()) == sorted(zl.namelist())
        for name in zd.namelist():
            assert zd.read(name) == zl.read(name)


class TestSkeletonizeVirtual:
    """Distributed skeletonization (rank algorithm, no transport):
    Z-partitioned bbox discovery + load-balanced label partition must
    be invisible in the output."""

    def test_rank_count_invariance(self, tmp_path):
        from aind_exaspim_neuron_segmentation_tpu.postprocess.distributed import (
            skeletonize_virtual,
        )

        seg = np.zeros((24, 18, 16), np.uint32)
        seg[2:22, 4, 4] = 1            # tube crossing every rank cut
        seg[5:9, 8:16, 10] = 2         # bar inside rank 0's range
        seg[12:20, 10:14, 2:14] = 3    # block inside a later range
        seg[1, 1, 1] = 4               # single corner voxel
        seg[14:19, 2:5, 2:5] = 7
        store = TestSkeletonizeLazy._store(tmp_path, seg)
        dense = skeletonize(seg)
        for n_ranks in (1, 2, 3, 5):
            got = skeletonize_virtual(store, n_ranks, slab_planes=5)
            TestSkeletonizeLazy._assert_same(dense, got)

    def test_single_label_black_border(self, tmp_path):
        """gmin/gmax must merge across rank partials: a constant store
        flips kimimaro's black_border switch globally."""
        from aind_exaspim_neuron_segmentation_tpu.postprocess.distributed import (
            skeletonize_virtual,
        )

        seg = np.ones((12, 8, 8), np.uint32)
        store = TestSkeletonizeLazy._store(tmp_path, seg)
        dense = skeletonize(seg)
        got = skeletonize_virtual(store, 3, slab_planes=4)
        TestSkeletonizeLazy._assert_same(dense, got)

    def test_label_partition_balances_and_covers(self):
        from aind_exaspim_neuron_segmentation_tpu.postprocess.distributed import (
            _partition_labels,
        )

        counts = np.array([0, 100, 1, 1, 1, 0, 50], np.int64)
        parts = _partition_labels(counts, 2)
        assert sorted(sum(parts, [])) == [1, 2, 3, 4, 6]
        # the heavy label sits alone against the light ones
        assert [1] in parts
        for part in parts:
            assert part == sorted(part)

    def test_more_ranks_than_planes(self, tmp_path):
        """A shallow volume on a wide job must NOT hard-fail: the crop
        pass is label-partitioned, so ranks beyond the plane count take
        empty bbox-scan ranges (advisor round-4 finding)."""
        from aind_exaspim_neuron_segmentation_tpu.postprocess.distributed import (
            skeletonize_virtual,
        )

        seg = np.zeros((3, 16, 16), np.uint32)
        seg[1, 3:13, 3:13] = 1
        seg[0:3, 14, 2:9] = 2
        store = TestSkeletonizeLazy._store(tmp_path, seg)
        dense = skeletonize(seg)
        got = skeletonize_virtual(store, 5, slab_planes=2)
        TestSkeletonizeLazy._assert_same(dense, got)
