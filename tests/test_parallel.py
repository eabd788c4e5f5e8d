"""Multi-chip tests on the 8-device virtual CPU mesh.

Sharded vs single-device comparisons are the TPU-world substitute for
the fake-backend infrastructure the reference lacks (SURVEY.md
section 4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from aind_exaspim_neuron_segmentation_tpu import inference, parallel

PATCH = (32, 32, 32)
OVERLAP = (8, 8, 8)
TRIM = 4


@pytest.fixture(scope="module")
def runner():
    return inference.load_model(
        affinity_mode=True, width_multiplier=0.25, dtype=jnp.float32
    )


def test_eight_devices_available():
    assert jax.device_count() >= 8


class TestShardedPercentile:
    def test_matches_numpy_across_mesh(self):
        mesh = parallel.make_mesh(8)
        rng = np.random.default_rng(0)
        x = rng.uniform(-100, 5000, size=(8, 4096)).astype(np.float32)

        def body(xl):
            return parallel.percentile_sharded(
                xl, (1.0, 99.9), x.size, "shard"
            )

        fn = jax.jit(shard_map(
            body, mesh=mesh, in_specs=P("shard"), out_specs=P(),
        ))
        got = np.asarray(
            fn(jax.device_put(x, NamedSharding(mesh, P("shard"))))
        )
        want = np.percentile(x, (1.0, 99.9))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_order_stat_exact(self):
        x = jnp.asarray([5.0, -2.0, 7.5, 0.0, 7.5, -9.0])
        for k, expect in enumerate([-9.0, -2.0, 0.0, 5.0, 7.5, 7.5]):
            assert float(parallel.order_stat(x, k)) == expect

    def test_rank_plan_overflow_guard(self):
        from aind_exaspim_neuron_segmentation_tpu.parallel import stats

        ks, plan = stats.rank_plan(101, (1.0, 99.9))
        assert ks == [1, 99, 100]
        assert plan == [(0, None, 0.0), (1, 2, pytest.approx(0.9))]
        with pytest.raises(ValueError, match="int32"):
            stats.rank_plan(2**31, (99.9,))

    def test_x64_rank_arithmetic(self):
        """With x64 enabled (the guard's advertised escape hatch),
        ranks >= 2^31 must actually work: counts widen to int64 and
        the huge-n rank_plan stops raising. Subprocess because x64 is
        a process-global switch."""
        import subprocess
        import sys

        code = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "jax.config.update('jax_enable_x64', True)\n"
            "import numpy as np\n"
            "from aind_exaspim_neuron_segmentation_tpu.parallel import"
            " stats\n"
            "ks, _ = stats.rank_plan(2**33, (99.9,))\n"
            "assert ks[0] > 2**31, ks\n"
            "x = np.arange(16, dtype=np.float32)\n"
            "v = stats.order_stat(x, 2**31 + 2)\n"  # no OverflowError
            "assert float(stats.order_stat(x, 3)) == 3.0\n"
            "print('X64-OK')\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            text=True, timeout=300,
        )
        assert "X64-OK" in out.stdout, out.stderr[-2000:]


class TestShardedPredict:
    def test_channel_mismatch_raises(self, runner):
        """A 1-channel mask model under affinity_mode=True must raise
        (like single-device predict), not silently broadcast into the
        3-channel accumulator."""
        mask_model = inference.load_model(
            affinity_mode=False, width_multiplier=0.25,
            dtype=jnp.float32,
        )
        vol = np.zeros((48, 48, 48), np.float32)
        with pytest.raises(ValueError, match="output channels"):
            parallel.predict_sharded(
                vol, mask_model, mesh=parallel.make_mesh(2),
                patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
                affinity_mode=True,
            )
        with pytest.raises(ValueError, match="output channels"):
            parallel.predict_sharded(
                vol, runner, mesh=parallel.make_mesh(2),
                patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
                affinity_mode=False,
            )

    def test_empty_grid_out_path_writes_store(self, runner, tmp_path):
        """The out_path contract (store written, lazy handle returned)
        must hold on the empty-grid corner too."""
        thin = np.zeros((4, 48, 48), np.float32)  # Z shorter than patch
        out = str(tmp_path / "thin.zarr")
        got = parallel.predict_sharded(
            thin, runner, mesh=parallel.make_mesh(2),
            patch_shape=PATCH, overlap=OVERLAP, trim=TRIM, out_path=out,
        )
        from aind_exaspim_neuron_segmentation_tpu import io

        assert np.asarray(got[:]).shape == (3, 4, 48, 48)
        np.testing.assert_array_equal(np.asarray(io.read(out)[:]), 0)
        # and the single-device path honors the same contract
        out2 = str(tmp_path / "thin1.zarr")
        got2 = inference.predict(
            thin, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
            out_path=out2, verbose=False,
        )
        assert np.asarray(got2[:]).shape == (3, 4, 48, 48)
        np.testing.assert_array_equal(np.asarray(io.read(out2)[:]), 0)

    @pytest.fixture(scope="class")
    def volume(self):
        rng = np.random.default_rng(1)
        return rng.uniform(0, 2000, size=(96, 56, 40)).astype(np.float32)

    def test_matches_single_device(self, runner, volume):
        want = inference.predict(
            volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
            batch_size=4, verbose=False,
        )
        mesh = parallel.make_mesh(4)
        got = parallel.predict_sharded(
            volume, runner, mesh=mesh, patch_shape=PATCH, overlap=OVERLAP,
            trim=TRIM, batch_size=4,
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_more_devices_than_rows(self, runner, volume):
        # 3 z-rows over 8 devices: some devices have no real rows
        mesh = parallel.make_mesh(8)
        want = inference.predict(
            volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
            batch_size=4, verbose=False,
        )
        got = parallel.predict_sharded(
            volume, runner, mesh=mesh, patch_shape=PATCH, overlap=OVERLAP,
            trim=TRIM, batch_size=4,
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_single_device_mesh(self, runner, volume):
        mesh = parallel.make_mesh(1)
        want = inference.predict(
            volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
            batch_size=4, verbose=False,
        )
        got = parallel.predict_sharded(
            volume, runner, mesh=mesh, patch_shape=PATCH, overlap=OVERLAP,
            trim=TRIM, batch_size=4,
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (1, 96, 96, 96, 3)


class TestDataParallelTrainer:
    def test_dp_trainer_runs_and_tracks_single_device(self, tmp_path):
        import tempfile

        from aind_exaspim_neuron_segmentation_tpu.machine_learning import (
            TrainDataset, ValidateDataset, Trainer,
        )

        rng = np.random.default_rng(0)
        imgs, labs = [], []
        for k in range(2):
            lab = np.zeros((48, 48, 48), np.uint32)
            lab[8:40, 8:24, 8:40] = k + 1
            img = rng.uniform(0, 80, (48, 48, 48)).astype(np.float32)
            img[lab > 0] += 400
            imgs.append(img)
            labs.append(lab)
        val = inference  # placeholder to satisfy lint; replaced below
        del val
        val_ds = ValidateDataset(
            imgs, labs, patch_shape=(16, 16, 16), containment_buffer=0
        )

        def run(mesh):
            tr = TrainDataset(imgs, labs, patch_shape=(16, 16, 16), seed=5)
            t = Trainer(
                str(tmp_path / ("dp" if mesh else "sd")), batch_size=4,
                max_epochs=1, width_multiplier=0.25, use_amp=False,
                mesh=mesh,
            )
            t.run(tr, val_ds)
            return t

        single = run(None)
        dp = run(parallel.make_mesh(4))
        pa = np.asarray(single.params["inc"]["conv1"]["kernel"])
        pb = np.asarray(dp.params["inc"]["conv1"]["kernel"])
        # identical data/semantics; only f32 reduction order differs
        assert np.abs(pa - pb).max() < 5e-3

    def test_dp_batch_must_divide(self):
        from aind_exaspim_neuron_segmentation_tpu.machine_learning.train import (
            Trainer,
        )

        with pytest.raises(ValueError, match="divide"):
            Trainer(
                "/tmp/x", batch_size=3, mesh=parallel.make_mesh(4),
                width_multiplier=0.25, use_amp=False,
            )


class TestHaloExchange:
    """Regression coverage for the spill > 0 ppermute path (the default
    96/32/8 grid has spill 16; the old test matrix only exercised
    spill 0)."""

    def test_spill_positive_matches_single_device(self, runner):
        rng = np.random.default_rng(7)
        vol = rng.uniform(0, 2000, (96, 48, 40)).astype(np.float32)
        kw = dict(
            patch_shape=(32, 32, 32), overlap=(16, 8, 8), trim=2,
            batch_size=4,
        )  # spill = 16 - 4 = 12 > 0
        want = inference.predict(vol, runner, verbose=False, **kw)
        got = parallel.predict_sharded(
            vol, runner, mesh=parallel.make_mesh(4), **kw
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_spill_exceeds_naive_own_depth(self, runner):
        # stride 10, core 24: requires multi-row recompute in predict and
        # the rows-per-device bump in predict_sharded (review regression)
        rng = np.random.default_rng(8)
        vol = rng.uniform(0, 2000, (52, 40, 40)).astype(np.float32)
        kw = dict(
            patch_shape=(32, 32, 32), overlap=(22, 8, 8), trim=4,
            batch_size=4,
        )
        want = inference.predict(vol, runner, verbose=False, **kw)
        slabbed = inference.predict(
            vol, runner, verbose=False, max_slab_rows=1, **kw
        )
        np.testing.assert_allclose(slabbed, want, atol=1e-6)
        got = parallel.predict_sharded(
            vol, runner, mesh=parallel.make_mesh(8), **kw
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


class Test2DMesh:
    """Z x Y slab sharding with two-phase (Z then Y) halo exchange."""

    @pytest.fixture(scope="class")
    def volume2d(self):
        rng = np.random.default_rng(11)
        return rng.uniform(0, 2000, (96, 88, 40)).astype(np.float32)

    @pytest.mark.parametrize("shape", [(2, 2), (4, 2), (2, 4)])
    def test_matches_single_device(self, runner, volume2d, shape):
        kw = dict(
            patch_shape=(32, 32, 32), overlap=(16, 16, 8), trim=2,
            batch_size=4,
        )  # spill 12 on both sharded axes: corner flow exercised
        want = inference.predict(volume2d, runner, verbose=False, **kw)
        got = parallel.predict_sharded(
            volume2d, runner, mesh=parallel.make_mesh_2d(shape), **kw
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_three_axis_mesh_rejected(self, runner, volume2d):
        import jax
        from jax.sharding import Mesh

        devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
        with pytest.raises(ValueError, match="1-D or 2-D"):
            parallel.predict_sharded(
                volume2d, runner, mesh=Mesh(devs, ("a", "b", "c")),
                patch_shape=(32, 32, 32), overlap=(8, 8, 8), trim=4,
            )


class TestShardedPredictParity:
    """Feature parity with single-device predict: lazy zarr in, streamed
    zarr out, gaussian blend -- without densifying input or output
    (VERDICT round-1 item 4)."""

    @pytest.fixture(scope="class")
    def volume(self):
        rng = np.random.default_rng(21)
        return rng.integers(0, 2000, (96, 56, 40)).astype(np.uint16)

    def test_lazy_zarr_in_zarr_out(self, runner, volume, tmp_path):
        from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite

        in_path = str(tmp_path / "in.zarr")
        zarr_lite.write_zarr(
            in_path, volume, chunks=(32, 32, 32),
            compressor={"id": "blosc", "cname": "lz4", "clevel": 5,
                        "shuffle": 1},
        )
        lazy = zarr_lite.open_zarr(in_path)
        want = inference.predict(
            volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
            batch_size=4, verbose=False,
        )
        out_path = str(tmp_path / "out.zarr")
        got = parallel.predict_sharded(
            lazy, runner, mesh=parallel.make_mesh(8), patch_shape=PATCH,
            overlap=OVERLAP, trim=TRIM, batch_size=4, out_path=out_path,
        )
        assert not isinstance(got, np.ndarray)  # lazy handle
        np.testing.assert_allclose(np.asarray(got[:]), want, atol=1e-6)

    def test_lazy_zarr_2d_mesh(self, runner, volume, tmp_path):
        from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite

        in_path = str(tmp_path / "in2.zarr")
        zarr_lite.write_zarr(in_path, volume, chunks=(32, 32, 32))
        lazy = zarr_lite.open_zarr(in_path)
        want = inference.predict(
            volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
            batch_size=4, verbose=False,
        )
        got = parallel.predict_sharded(
            lazy, runner, mesh=parallel.make_mesh_2d((2, 2)),
            patch_shape=PATCH, overlap=OVERLAP, trim=TRIM, batch_size=4,
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_sharded_zarr_feeds_streaming_segmentation(
        self, runner, volume, tmp_path
    ):
        """Composition: the zarr store predict_sharded streams out is
        directly consumable by the beyond-RAM lazy segmentation path,
        bit-identical to densifying that same store first."""
        from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite

        out_path = str(tmp_path / "aff.zarr")
        handle = parallel.predict_sharded(
            volume, runner, mesh=parallel.make_mesh(4), patch_shape=PATCH,
            overlap=OVERLAP, trim=TRIM, batch_size=4, out_path=out_path,
        )
        dense = np.ascontiguousarray(np.asarray(handle[:]), np.float32)
        seg_lazy = inference.affinities_to_segmentation(
            zarr_lite.open_zarr(out_path)
        )
        seg_dense = inference.affinities_to_segmentation(dense)
        np.testing.assert_array_equal(seg_lazy, seg_dense)

    def test_gaussian_blend_matches_single_device(self, runner, volume):
        want = inference.predict(
            volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
            batch_size=4, verbose=False, blend_mode="gaussian",
        )
        got = parallel.predict_sharded(
            volume, runner, mesh=parallel.make_mesh(4), patch_shape=PATCH,
            overlap=OVERLAP, trim=TRIM, batch_size=4,
            blend_mode="gaussian",
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestShardedPredigest:
    """On-device digest at mesh scale: predict_sharded(predigest=True)
    must be bit-identical to host-digesting the same sharded run's
    float output (the halos ride one extra single-plane ppermute per
    sharded axis)."""

    @pytest.fixture(scope="class")
    def volume(self):
        rng = np.random.default_rng(61)
        return rng.integers(0, 2000, (64, 48, 32)).astype(np.uint16)

    KW = dict(patch_shape=(32, 32, 32), overlap=(8, 8, 8), trim=4,
              batch_size=4)

    @pytest.mark.parametrize("shape", [(4,), (2, 2), (2, 4)])
    def test_matches_host_digest_of_sharded_floats(
        self, runner, volume, shape
    ):
        from aind_exaspim_neuron_segmentation_tpu.ops import predigest

        mesh = (parallel.make_mesh(shape[0]) if len(shape) == 1
                else parallel.make_mesh_2d(shape))
        aff = parallel.predict_sharded(volume, runner, mesh=mesh,
                                       **self.KW)
        want_plan, want_q = predigest.predigest(aff)
        plan, qaff = parallel.predict_sharded(
            volume, runner, mesh=mesh, predigest=True, **self.KW
        )
        np.testing.assert_array_equal(plan, want_plan)
        np.testing.assert_array_equal(qaff, want_q)
        seg_f = inference.affinities_to_segmentation(
            np.ascontiguousarray(aff)
        )
        seg_p = inference.affinities_to_segmentation((plan, qaff))
        np.testing.assert_array_equal(seg_f, seg_p)

    def test_digest_stores_match_in_ram(self, runner, volume, tmp_path):
        """out_path=(plan, qaff) streams the same bytes into Zarr and
        the lazy pair feeds affinities_to_segmentation directly."""
        mesh = parallel.make_mesh(4)
        want_plan, want_q = parallel.predict_sharded(
            volume, runner, mesh=mesh, predigest=True, **self.KW
        )
        pp = str(tmp_path / "plan.zarr")
        qp = str(tmp_path / "qaff.zarr")
        plan_h, qaff_h = parallel.predict_sharded(
            volume, runner, mesh=mesh, predigest=True,
            out_path=(pp, qp), **self.KW
        )
        np.testing.assert_array_equal(want_plan, np.asarray(plan_h[:]))
        np.testing.assert_array_equal(want_q, np.asarray(qaff_h[:]))
        seg_ram = inference.affinities_to_segmentation(
            (want_plan, want_q)
        )
        seg_lazy = inference.affinities_to_segmentation((plan_h, qaff_h))
        np.testing.assert_array_equal(seg_ram, seg_lazy)

    def test_rejected_combinations(self, runner, volume):
        mesh = parallel.make_mesh(2)
        with pytest.raises(ValueError, match="affinity_mode"):
            parallel.predict_sharded(
                volume, runner, mesh=mesh, predigest=True,
                affinity_mode=False, **self.KW
            )
        with pytest.raises(ValueError, match="out_path"):
            parallel.predict_sharded(
                volume, runner, mesh=mesh, predigest=True,
                out_path="/tmp/nope.zarr", **self.KW
            )
        with pytest.raises(ValueError, match="single band"):
            parallel.predict_sharded(
                volume, runner, mesh=mesh, predigest=True,
                max_band_rows=1, **self.KW
            )


class TestDistributedInit:
    def test_single_process_noop(self):
        """Without a coordinator address the wrapper must not touch the
        runtime (this test process would hang otherwise)."""
        import os

        from aind_exaspim_neuron_segmentation_tpu.parallel.mesh import (
            initialize_distributed,
        )

        for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                    "MEGASCALE_COORDINATOR_ADDRESS"):
            assert os.environ.get(var) is None
        # single-host TPU VMs export TPU_WORKER_HOSTNAMES=localhost --
        # the wrapper must only trigger on MULTIPLE workers
        assert len([h for h in os.environ.get(
            "TPU_WORKER_HOSTNAMES", "").split(",") if h]) <= 1
        assert initialize_distributed() is False


class TestBandedSharded:
    """Z-band streaming (max_band_rows): bounded device memory with
    boundary-row recompute between bands -- must match single-device
    predict exactly like the one-shot path does."""

    @pytest.fixture(scope="class")
    def volume(self):
        rng = np.random.default_rng(33)
        return rng.integers(0, 2000, (96, 56, 40)).astype(np.uint16)

    @pytest.fixture(scope="class")
    def want(self, runner, volume):
        return inference.predict(
            volume, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
            batch_size=4, verbose=False,
        )

    @pytest.mark.parametrize("band_rows", [1, 2])
    def test_banded_matches_single_device(self, runner, volume, want,
                                          band_rows):
        got = parallel.predict_sharded(
            volume, runner, mesh=parallel.make_mesh(2), patch_shape=PATCH,
            overlap=OVERLAP, trim=TRIM, batch_size=4,
            max_band_rows=band_rows,
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_banded_2d_lazy_zarr_out(self, runner, volume, want, tmp_path):
        from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite

        in_path = str(tmp_path / "in.zarr")
        zarr_lite.write_zarr(in_path, volume, chunks=(32, 32, 32))
        lazy = zarr_lite.open_zarr(in_path)
        out_path = str(tmp_path / "out.zarr")
        got = parallel.predict_sharded(
            lazy, runner, mesh=parallel.make_mesh_2d((2, 2)),
            patch_shape=PATCH, overlap=OVERLAP, trim=TRIM, batch_size=4,
            max_band_rows=2, out_path=out_path,
        )
        np.testing.assert_allclose(np.asarray(got[:]), want, atol=1e-6)


class TestAutoBanding:
    def test_auto_band_rows_fits(self):
        from aind_exaspim_neuron_segmentation_tpu.parallel.sharded_inference import (  # noqa: E501
            _auto_band_rows,
        )

        # small volume: everything fits -> single band
        assert _auto_band_rows(10, 4, 64, 96, 4 * 4 * 256 * 256) is None
        # large plane: budget forces banding, rows a multiple of nz
        plane = 4 * 4 * 1024 * 1024  # ~16.8 MB per z plane per device
        rows = _auto_band_rows(200, 4, 64, 96, plane,
                               budget=4 * 1024**3)
        assert rows is not None and rows % 4 == 0 and rows < 200
        # per-device z extent fits the budget
        per_dev_z = (rows // 4) * 64 + 96
        assert per_dev_z * plane <= 4 * 1024**3

    def test_forced_single_band(self, runner):
        rng = np.random.default_rng(40)
        vol = rng.integers(0, 2000, (64, 40, 32)).astype(np.uint16)
        want = inference.predict(
            vol, runner, patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
            batch_size=4, verbose=False,
        )
        got = parallel.predict_sharded(
            vol, runner, mesh=parallel.make_mesh(2), patch_shape=PATCH,
            overlap=OVERLAP, trim=TRIM, batch_size=4, max_band_rows=0,
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestYsplitChunkGrid:
    def test_gcd_chunk_height(self):
        from aind_exaspim_neuron_segmentation_tpu.parallel.sharded_inference import (  # noqa: E501
            _ysplit_chunk_grid,
        )

        # healthy gcd: chunk height divides every shard boundary
        assert _ysplit_chunk_grid(8, 64, (32, 256, 300)) == (8, 256)
        # zero trim: shard size itself (halved down to <= 256)
        assert _ysplit_chunk_grid(0, 1024, (32, 2048, 100)) == (256, 100)

    def test_degenerate_gcd_warns(self):
        """Coprime trim/own (cy=1) stays correct but warns with the
        object count (advisor round-4 finding)."""
        import warnings

        from aind_exaspim_neuron_segmentation_tpu.parallel.sharded_inference import (  # noqa: E501
            _ysplit_chunk_grid,
        )

        with pytest.warns(RuntimeWarning, match="degenerate"):
            cy, cx = _ysplit_chunk_grid(8, 125, (16, 258, 64))
        assert (cy, cx) == (1, 64)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # healthy case: no warning
            _ysplit_chunk_grid(8, 128, (16, 258, 64))


class TestForegroundModeSharded:
    def test_non_affinity_matches_single_device(self):
        rng = np.random.default_rng(50)
        vol = rng.integers(0, 2000, (64, 40, 32)).astype(np.uint16)
        fg_runner = inference.load_model(
            affinity_mode=False, width_multiplier=0.25,
            dtype=np.float32,
        )
        kw = dict(patch_shape=PATCH, overlap=OVERLAP, trim=TRIM,
                  batch_size=4, affinity_mode=False)
        want = inference.predict(vol, fg_runner, verbose=False, **kw)
        got = parallel.predict_sharded(
            vol, fg_runner, mesh=parallel.make_mesh(4), **kw
        )
        assert got.ndim == 3  # (D, H, W) like predict
        np.testing.assert_allclose(got, want, atol=1e-6)
