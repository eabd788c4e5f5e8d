"""utils layer: fs helpers, GCS listing (mocked), viz smoke tests."""

import os

import numpy as np

from aind_exaspim_neuron_segmentation_tpu.utils import img_util, util


class FakeBlob:
    def __init__(self, name):
        self.name = name


class FakeBlobIter:
    def __init__(self, blobs, prefixes):
        self._blobs = [FakeBlob(b) for b in blobs]
        self.prefixes = prefixes

    def __iter__(self):
        return iter(self._blobs)


class FakeClient:
    """Stands in for google.cloud.storage.Client (offline harness)."""

    def __init__(self, tree):
        self.tree = tree  # prefix -> (blobs, prefixes)

    def list_blobs(self, bucket, prefix="", delimiter=None):
        blobs, prefixes = self.tree.get(prefix, ([], []))
        if delimiter is None:
            return FakeBlobIter(blobs, [])
        return FakeBlobIter(blobs, prefixes)


class TestFs:
    def test_mkdir_rmdir(self, tmp_path):
        p = str(tmp_path / "a" / "b")
        util.mkdir(p)
        assert os.path.isdir(p)
        util.mkdir(p, delete=True)
        assert os.path.isdir(p)
        util.rmdir(p)
        assert not os.path.exists(p)


class TestGcs:
    def make_client(self):
        return FakeClient({
            "data/": (
                [],
                ["data/block0/", "data/block1/"],
            ),
            "data/block0/": (
                ["data/block0/readme.txt"],
                ["data/block0/input.zarr/", "data/block0/Fill_Label_Mask.zarr/"],
            ),
            "data/block1/": (
                [],
                ["data/block1/input.tif/", "data/block1/Fill_Label_Mask.tif/"],
            ),
        })

    def test_list_subprefixes(self):
        c = self.make_client()
        subs = util.list_gcs_subprefixes("b", "data/", client=c)
        assert subs == ["data/block0/", "data/block1/"]

    def test_find_subprefix_with_keyword(self):
        c = self.make_client()
        got = util.find_subprefix_with_keyword(
            "b", "data/block0/", "input.", client=c
        )
        assert got == "data/block0/input.zarr/"

    def test_find_keyword_missing_raises(self):
        c = self.make_client()
        try:
            util.find_subprefix_with_keyword(
                "b", "data/block0/", "nope", client=c
            )
            assert False
        except LookupError:
            pass

    def test_list_block_paths(self):
        c = self.make_client()
        imgs, labs = img_util.list_block_paths("data/", client=c)
        assert imgs[0] == "gs://allen-nd-goog/data/block0/input.zarr/"
        assert labs[1] == "gs://allen-nd-goog/data/block1/Fill_Label_Mask.tif/"


class TestViz:
    def test_plot_mips(self, tmp_path):
        img = np.random.default_rng(0).uniform(0, 100, (8, 8, 8))
        out = str(tmp_path / "mips.png")
        img_util.plot_mips(img, output_path=out)
        assert os.path.getsize(out) > 0

    def test_plot_segmentation_mips_5d(self, tmp_path):
        seg = np.zeros((1, 1, 8, 8, 8), np.uint32)
        seg[0, 0, 2:6, 2:6, 2:6] = 3
        out = str(tmp_path / "seg.png")
        img_util.plot_segmentation_mips(seg, output_path=out)
        assert os.path.getsize(out) > 0

    def test_img_util_reexports(self):
        assert img_util.read is not None
        assert img_util.normalize is not None
        assert img_util.get_affinity_channels is not None


class TestRetry:
    def test_retries_then_succeeds(self):
        from aind_exaspim_neuron_segmentation_tpu.utils.retry import retry

        calls = []

        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise ConnectionError("transient")
            return "ok"

        assert retry(flaky, base_delay=0.001) == "ok"
        assert len(calls) == 3

    def test_gives_up_after_attempts(self):
        import pytest

        from aind_exaspim_neuron_segmentation_tpu.utils.retry import retry

        def always_fails():
            raise TimeoutError("down")

        with pytest.raises(TimeoutError):
            retry(always_fails, attempts=2, base_delay=0.001)

    def test_non_transient_propagates_immediately(self):
        import pytest

        from aind_exaspim_neuron_segmentation_tpu.utils.retry import retry

        calls = []

        def bad():
            calls.append(1)
            raise ValueError("permanent")

        with pytest.raises(ValueError):
            retry(bad, base_delay=0.001)
        assert len(calls) == 1


class TestRetryNonTransient:
    def test_file_not_found_no_retry(self):
        from aind_exaspim_neuron_segmentation_tpu.utils.retry import retry

        calls = []

        def missing():
            calls.append(1)
            raise FileNotFoundError("no such chunk")

        import pytest

        with pytest.raises(FileNotFoundError):
            retry(missing, base_delay=0.001)
        assert len(calls) == 1  # no backoff for missing chunks

    def test_subprefix_prefix_without_slash(self):
        from aind_exaspim_neuron_segmentation_tpu.utils import util

        class C:
            def list_blobs(self, bucket, prefix="", delimiter=None):
                assert prefix.endswith("/")

                class R:
                    prefixes = ["data/b1/", "data/b2/"]

                    def __iter__(self):
                        return iter([])

                return R()

        subs = util.list_gcs_subprefixes("b", "data", client=C())
        assert subs == ["data/b1/", "data/b2/"]


class TestProfiling:
    def test_stage_timer(self):
        import time

        from aind_exaspim_neuron_segmentation_tpu.utils.profiling import (
            StageTimer,
        )

        t = StageTimer(sync=False)
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("b"):
            pass
        assert t.counts["a"] == 2 and t.counts["b"] == 1
        assert t.totals["a"] >= 0.02
        summary = t.summary()
        assert "a" in summary and "%" in summary
        assert set(t.as_dict()) == {"a", "b"}

    def test_trace_writes_files(self, tmp_path):
        import os

        import jax.numpy as jnp

        from aind_exaspim_neuron_segmentation_tpu.utils.profiling import (
            annotate,
            trace,
        )

        with trace(str(tmp_path)):
            with annotate("work"):
                jnp.ones(8).sum().block_until_ready()
        assert any(os.scandir(tmp_path))
