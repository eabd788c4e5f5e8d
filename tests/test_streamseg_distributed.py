"""Distributed streaming segmentation: bit-parity for any rank count.

postprocess/distributed.py partitions the Z range over ranks (virtual
in-process here; two REAL jax.distributed processes in
tests/test_multiprocess.py) and must reproduce single-process
``segment_streaming`` -- and therefore the dense engine -- EXACTLY:
fragment numbering, RAG edge order, merge events, min-size filter.
"""

import threading

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu import inference
from aind_exaspim_neuron_segmentation_tpu.io import read
from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import write_zarr
from aind_exaspim_neuron_segmentation_tpu.postprocess.distributed import (
    _TcpComm,
    partition_z,
    segment_streaming_virtual,
)

from .test_streamseg import _blobby_affs, _lazy, _noisy_affs


class TestRankWorkerValidation:
    def test_digest_pair_shape_mismatch_fails_fast(self):
        """A mismatched (plan, qaff) pair must raise up front (the
        segment_streaming contract), not deep inside rag_feed."""
        from aind_exaspim_neuron_segmentation_tpu.postprocess import (
            distributed,
        )

        plan = np.zeros((8, 8, 8), np.uint8)
        qaff = np.zeros((3, 8, 8, 4), np.uint8)  # wrong W
        with pytest.raises(ValueError, match="do not match"):
            distributed._RankWorker((plan, qaff), (0, 8))


class TestPartition:
    def test_balanced_cover(self):
        for d, n in ((10, 3), (8, 8), (23, 4), (5, 1)):
            parts = partition_z(d, n)
            assert parts[0][0] == 0 and parts[-1][1] == d
            assert all(a[1] == b[0] for a, b in zip(parts, parts[1:]))
            sizes = [hi - lo for lo, hi in parts]
            assert max(sizes) - min(sizes) <= 1

    def test_too_many_ranks_rejected(self):
        with pytest.raises(ValueError):
            partition_z(3, 4)


class TestDistributedParity:
    @pytest.mark.parametrize("n_ranks", [1, 2, 3, 5])
    def test_noisy_volume_rank_invariance(self, tmp_path, n_ranks):
        """Worst-case noise (one giant cross-rank RAG component)."""
        aff = _noisy_affs(shape=(22, 18, 14), seed=11)
        want = inference.affinities_to_segmentation(aff)
        got = segment_streaming_virtual(
            _lazy(tmp_path, aff), n_ranks, tmp_dir=str(tmp_path)
        )
        np.testing.assert_array_equal(want, got)

    @pytest.mark.parametrize("n_ranks", [2, 4])
    def test_blobby_multi_component(self, tmp_path, n_ranks):
        """Spheres crossing rank cuts stitch bit-identically."""
        aff = _blobby_affs()
        want = inference.affinities_to_segmentation(aff)
        got = segment_streaming_virtual(
            _lazy(tmp_path, aff), n_ranks, tmp_dir=str(tmp_path),
            slab_planes=6,
        )
        assert want.max() > 1
        np.testing.assert_array_equal(want, got)

    def test_u_shape_fragment_across_rank_cut(self, tmp_path):
        """Two pieces in earlier ranks union only through a later rank:
        the rank-0 piece unification must chain across TWO cuts."""
        shape = (12, 9, 9)
        aff = np.full((3,) + shape, 0.02, np.float32)
        aff[0, 0:10, 2, 2] = 0.95
        aff[0, 0:10, 2, 6] = 0.95
        aff[2, 9, 2, 2:6] = 0.95
        want = inference.affinities_to_segmentation(
            aff, min_segment_size=0
        )
        got = segment_streaming_virtual(
            _lazy(tmp_path, aff), 3, min_segment_size=0,
            tmp_dir=str(tmp_path),
        )
        assert want.max() == 1
        np.testing.assert_array_equal(want, got)

    @pytest.mark.parametrize("min_size", [0, 5, 100])
    def test_min_size_filter(self, tmp_path, min_size):
        aff = _blobby_affs(shape=(30, 20, 20), r=4, seed=9, step=10)
        want = inference.affinities_to_segmentation(
            aff, min_segment_size=min_size
        )
        got = segment_streaming_virtual(
            _lazy(tmp_path, aff), 3, min_segment_size=min_size,
            tmp_dir=str(tmp_path), slab_planes=4,
        )
        np.testing.assert_array_equal(want, got)

    def test_custom_thresholds_and_lowhigh(self, tmp_path):
        aff = _noisy_affs(shape=(18, 14, 12), seed=13)
        kw = dict(
            agglomeration_thresholds=(0.3, 0.7),
            aff_threshold_low=0.25, aff_threshold_high=0.9,
        )
        want = inference.affinities_to_segmentation(aff, **kw)
        got = segment_streaming_virtual(
            _lazy(tmp_path, aff), 2, tmp_dir=str(tmp_path), **kw
        )
        np.testing.assert_array_equal(want, got)

    def test_all_background(self, tmp_path):
        aff = np.full((3, 10, 8, 8), 0.01, np.float32)
        got = segment_streaming_virtual(
            _lazy(tmp_path, aff), 3, tmp_dir=str(tmp_path)
        )
        assert got.dtype == np.uint32 and got.max() == 0

    def test_digest_pair_replay(self, tmp_path):
        """Lazy (plan, qaff) stores distribute without a device pass."""
        from aind_exaspim_neuron_segmentation_tpu.ops.predigest import (
            predigest,
        )

        aff = _blobby_affs(shape=(26, 18, 18), r=4, seed=31, step=10)
        plan, qaff = predigest(aff)
        pp, qp = str(tmp_path / "p.zarr"), str(tmp_path / "q.zarr")
        write_zarr(pp, plan, chunks=(6, 18, 18))
        write_zarr(qp, qaff, chunks=(3, 6, 18, 18))
        want = inference.affinities_to_segmentation(aff)
        got = segment_streaming_virtual(
            (read(pp), read(qp)), 3, tmp_dir=str(tmp_path)
        )
        np.testing.assert_array_equal(want, got)

    def test_zarr_output_contract(self, tmp_path):
        """Each rank writes its own Z rows; the joint store matches."""
        aff = _blobby_affs(shape=(24, 16, 16), r=4, seed=21, step=10)
        want = inference.affinities_to_segmentation(aff)
        out_path = str(tmp_path / "seg.zarr")
        handle = segment_streaming_virtual(
            _lazy(tmp_path, aff), 2, out_path=out_path,
            tmp_dir=str(tmp_path),
        )
        assert handle.shape == want.shape
        np.testing.assert_array_equal(want, np.asarray(handle[:]))

    def test_single_plane_ranks(self, tmp_path):
        """Degenerate partition: every rank holds exactly one plane."""
        aff = _noisy_affs(shape=(6, 10, 10), seed=5)
        want = inference.affinities_to_segmentation(aff)
        got = segment_streaming_virtual(
            _lazy(tmp_path, aff), 6, tmp_dir=str(tmp_path)
        )
        np.testing.assert_array_equal(want, got)


class TestComponentPartitionedMerge:
    """route_rag_parts -> merge_rag_local -> compose_rag_lut: the
    multi-rank merge must equal rank-0's monolithic merge_rag_parts
    bit-for-bit, for any owner count (rag.hpp run_merge contract:
    components are independent serial programs)."""

    @staticmethod
    def _parts(tmp_path, aff, n_ranks):
        import tempfile

        from aind_exaspim_neuron_segmentation_tpu.postprocess.distributed import (  # noqa: E501
            _RankWorker, _hub_stitch,
        )

        workers = [
            _RankWorker(
                _lazy(tmp_path, aff), zr,
                tmp_dir=tempfile.mkdtemp(dir=tmp_path),
            )
            for zr in partition_z(aff.shape[1], n_ranks)
        ]
        exports = [w.pass1() for w in workers]
        ws_per_rank, k, frag_fg, next_ws = _hub_stitch(exports)
        parts = [
            w.pass2(ws_per_rank[r], k, next_ws[r])
            for r, w in enumerate(workers)
        ]
        for w in workers:
            w.close()
        return parts, k, frag_fg

    @pytest.mark.parametrize("n_owners", [1, 2, 3, 7])
    def test_owner_count_invariance(self, tmp_path, n_owners):
        from aind_exaspim_neuron_segmentation_tpu import native

        aff = _blobby_affs(shape=(24, 18, 18), r=4, seed=3, step=9)
        parts, k, frag_fg = self._parts(tmp_path, aff, 2)
        th = [0.6, 0.8, 0.9]
        want_lut, want_n = native.merge_rag_parts(
            parts, k, frag_fg, th, min_segment_size=5
        )
        routed = native.route_rag_parts(parts, k, n_owners)
        assert len(routed) == n_owners
        pairs = [native.merge_rag_local(b, k, th) for b in routed]
        lut, n = native.compose_rag_lut(
            k, frag_fg, pairs, min_segment_size=5
        )
        assert n == want_n
        np.testing.assert_array_equal(lut, want_lut)

    def test_single_giant_component_routes_whole(self, tmp_path):
        """Worst case: one cross-rank component -- one owner gets all
        records, the others get empty payloads, output unchanged."""
        from aind_exaspim_neuron_segmentation_tpu import native

        aff = _noisy_affs(shape=(16, 12, 12), seed=4)
        parts, k, frag_fg = self._parts(tmp_path, aff, 2)
        th = [0.6, 0.8, 0.9]
        routed = native.route_rag_parts(parts, k, 3)
        n_records = [
            int(np.frombuffer(b[:8], np.uint64)[0]) for b in routed
        ]
        assert sorted(n_records)[:2] == [0, 0] and max(n_records) > 0
        pairs = [native.merge_rag_local(b, k, th) for b in routed]
        assert [len(p) for p in pairs].count(0) == 2
        want_lut, want_n = native.merge_rag_parts(
            parts, k, frag_fg, th, min_segment_size=0
        )
        lut, n = native.compose_rag_lut(
            k, frag_fg, pairs, min_segment_size=0
        )
        assert n == want_n
        np.testing.assert_array_equal(lut, want_lut)

    def test_routing_preserves_stream_order_per_component(self, tmp_path):
        """Concatenating every owner's records in owner-iteration order
        must preserve each component's record multiset (and the total
        byte volume, headers aside)."""
        from aind_exaspim_neuron_segmentation_tpu import native

        aff = _blobby_affs(shape=(30, 20, 20), r=4, seed=9, step=10)
        parts, k, _ = self._parts(tmp_path, aff, 3)
        routed = native.route_rag_parts(parts, k, 4)
        assert sum(len(b) - 8 for b in routed) == sum(
            len(p) - 8 for p in parts
        )
        total = sum(int(np.frombuffer(b[:8], np.uint64)[0]) for b in routed)
        want = 0
        for p in parts:
            want += int(np.frombuffer(p[:8], np.uint64)[0])
        assert total == want

    def test_malformed_part_rejected(self):
        from aind_exaspim_neuron_segmentation_tpu import native

        with pytest.raises(RuntimeError, match="malformed"):
            native.route_rag_parts([b"\x01" + b"\0" * 10], 5, 2)

    def test_fuzzed_parts_never_crash(self, tmp_path):
        """Serialized parts cross the network: mutated payloads (byte
        flips, truncations, junk extensions) must either parse to a
        sane result or raise the malformed-input error -- never read
        out of bounds. Deterministic 200-case fuzz over a real part."""
        from aind_exaspim_neuron_segmentation_tpu import native

        aff = _blobby_affs(shape=(16, 12, 12), r=4, seed=5, step=8)
        parts, k, _ = self._parts(tmp_path, aff, 2)
        base = bytearray(parts[0])
        th = [0.6, 0.8, 0.9]
        rng = np.random.default_rng(0)
        for case in range(200):
            buf = bytearray(base)
            kind = case % 4
            if kind == 0:  # flip 1-4 bytes anywhere
                for _ in range(int(rng.integers(1, 5))):
                    buf[int(rng.integers(len(buf)))] = int(
                        rng.integers(256)
                    )
            elif kind == 1:  # truncate
                buf = buf[: int(rng.integers(len(buf)))]
            elif kind == 2:  # extend with junk
                buf += bytes(rng.integers(0, 256, 16, dtype=np.uint8))
            else:  # clobber the record-count header
                buf[:8] = rng.integers(
                    0, 256, 8, dtype=np.uint8
                ).tobytes()
            payload = bytes(buf)
            for fn in (
                lambda b: native.route_rag_parts([b, parts[1]], k, 3),
                lambda b: native.merge_rag_local(b, k, th),
            ):
                try:
                    fn(payload)
                except (RuntimeError, ValueError):
                    pass  # malformed input correctly rejected

    def test_double_drop_pairs_rejected(self):
        from aind_exaspim_neuron_segmentation_tpu import native

        pairs = np.array([[1, 2], [3, 2]], np.uint32)  # 2 dropped twice
        with pytest.raises(RuntimeError, match="rc=-2"):
            native.compose_rag_lut(
                3, np.array([0, 10, 10, 10], np.uint64), [pairs]
            )


class TestTcpComm:
    def test_gather_scatter_broadcast(self):
        """3-rank hub protocol over localhost sockets (threads)."""
        import socket

        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        port = srv.getsockname()[1]
        srv.close()
        addr = f"127.0.0.1:{port}"
        results = {}

        def run(rank):
            comm = _TcpComm(rank, 3, addr)
            g = comm.gather({"rank": rank, "data": np.arange(rank + 1)})
            if rank == 0:
                assert [e["rank"] for e in g] == [0, 1, 2]
                reply = [f"to-{r}" for r in range(3)]
            else:
                assert g is None
                reply = None
            mine = comm.scatter(reply)
            assert mine == f"to-{rank}"
            b = comm.broadcast("done" if rank == 0 else None)
            results[rank] = b
            comm.close()

        threads = [
            threading.Thread(target=run, args=(r,)) for r in (1, 2, 0)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert results == {0: "done", 1: "done", 2: "done"}

    def test_hub_timeout_env_fails_fast(self, monkeypatch):
        """EXA_HUB_TIMEOUT_S bounds recv on a wedged-but-alive peer:
        rank 0 gathers while rank 1 connects and then goes silent --
        the gather must raise socket.timeout, not block forever."""
        import socket

        monkeypatch.setenv("EXA_HUB_TIMEOUT_S", "0.5")
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        port = srv.getsockname()[1]
        srv.close()
        addr = f"127.0.0.1:{port}"
        outcome = {}
        silent_done = threading.Event()

        def silent_peer():
            comm = _TcpComm(1, 2, addr)  # handshakes, then says nothing
            silent_done.wait(10)
            comm.close()

        def hub():
            comm = _TcpComm(0, 2, addr)
            try:
                comm.gather("x")
                outcome["err"] = None
            except socket.timeout as e:
                outcome["err"] = e
            finally:
                silent_done.set()
                comm.close()

        threads = [
            threading.Thread(target=silent_peer),
            threading.Thread(target=hub),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert isinstance(outcome["err"], socket.timeout)


class TestSkeletonizeSingleProcessStats:
    def test_stats_contract_matches_multirank_fields(self, tmp_path):
        """The n==1 fast path of skeletonize_sharded must honor the
        documented stats_out contract (per-pass walls, labels_local,
        n_skeletons, hub byte counts) exactly like the multi-rank
        path, and stay bit-identical to skeletonize_lazy."""
        import zipfile

        from aind_exaspim_neuron_segmentation_tpu.postprocess import (
            skeleton as sk,
        )
        from aind_exaspim_neuron_segmentation_tpu.postprocess.distributed import (  # noqa: E501
            skeletonize_sharded,
        )

        lab = np.zeros((12, 12, 12), np.uint32)
        lab[2:10, 2:5, 2:10] = 1
        lab[2:10, 7:10, 2:10] = 2
        stats = {}
        zp = str(tmp_path / "skels.zip")
        got = skeletonize_sharded(lab, zip_path=zp, stats_out=stats)
        want = sk.skeletonize_lazy(lab)
        assert set(got) == set(want) and len(got) == 2
        for lab_id in got:
            assert got[lab_id].to_swc() == want[lab_id].to_swc()
        for key in ("rank", "bbox_scan_s", "labels_local", "crop_pass_s",
                    "n_skeletons", "zip_s", "bytes_sent", "bytes_recv",
                    "ranks"):
            assert key in stats, f"stats_out missing {key}"
        assert stats["n_skeletons"] == 2
        assert stats["labels_local"] == 2
        assert stats["bytes_sent"] == 0 and stats["bytes_recv"] == 0
        with zipfile.ZipFile(zp) as zf:
            assert sorted(zf.namelist()) == ["1.swc", "2.swc"]


class TestSegmentSingleProcessStats:
    def test_stats_contract_fields_and_parity(self, tmp_path):
        """The n==1 fast path of segment_streaming_sharded must honor
        the documented stats_out contract (per-pass walls, RAG part
        bytes, zero hub bytes; dense ``merge_s`` rather than the
        routed path's route/merge_local/compose split) and stay
        bit-identical to the dense engine."""
        from aind_exaspim_neuron_segmentation_tpu.postprocess.distributed import (  # noqa: E501
            segment_streaming_sharded,
        )

        aff = _blobby_affs(shape=(16, 12, 12), r=4, seed=5, step=8)
        want = inference.affinities_to_segmentation(aff, min_segment_size=10)
        stats = {}
        z0, labels = segment_streaming_sharded(
            aff, min_segment_size=10, tmp_dir=str(tmp_path),
            stats_out=stats,
        )
        assert z0 == 0
        np.testing.assert_array_equal(want, labels)
        for key in ("rank", "pass1_s", "stitch_s", "rag_build_s",
                    "rag_part_bytes", "merge_s", "relabel_s",
                    "bytes_sent", "bytes_recv", "ranks"):
            assert key in stats, f"stats_out missing {key}"
        assert stats["rank"] == 0
        assert stats["rag_part_bytes"] >= 8
        assert stats["bytes_sent"] == 0 and stats["bytes_recv"] == 0
        assert stats["ranks"] == [
            {k: v for k, v in stats.items() if k != "ranks"}
        ]
