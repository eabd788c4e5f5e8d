"""CLI (`python -m aind_exaspim_neuron_segmentation_tpu`) end-to-end.

Drives the argparse surface in-process (same interpreter contract as
``python -m``; subprocesses would pay a fresh jax import per step on
this 1-core host). Covers: predict -> Zarr store, segment -> Zarr
store, swc -> zip, the beyond-RAM ``run`` pipeline (pre-digest +
streaming segmentation), and train for one epoch.
"""

import json
import os
import zipfile

import numpy as np
import pytest

from aind_exaspim_neuron_segmentation_tpu import io
from aind_exaspim_neuron_segmentation_tpu.__main__ import main

PATCH = ["--patch", "32", "--overlap", "16,16,16", "--trim", "4",
         "--batch-size", "4", "--width-multiplier", "0.25", "--quiet"]


@pytest.fixture(scope="module")
def volume_store(tmp_path_factory):
    """48^3 uint16 volume with a bright blob, as a local zarr store."""
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 300, (48, 48, 48)).astype(np.uint16)
    zz, yy, xx = np.ogrid[-10:11, -10:11, -10:11]
    ball = zz**2 + yy**2 + xx**2 < 100
    vol[14:35, 14:35, 14:35][ball] = 1200
    path = str(tmp_path_factory.mktemp("cli") / "vol.zarr")
    io.write_zarr(path, vol, chunks=(16, 16, 16))
    return path


def _capture_json(capsys):
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_predict_segment_swc(volume_store, tmp_path, capsys):
    affs = str(tmp_path / "affs.zarr")
    main(["predict", "--input", volume_store, "--output", affs] + PATCH)
    assert _capture_json(capsys) == {"predict": affs}
    handle = io.read(affs)
    assert handle.shape == (3, 48, 48, 48)
    assert handle.dtype == np.float32

    seg_p = str(tmp_path / "seg.zarr")
    main(["segment", "--affinities", affs, "--output", seg_p,
          "--min-size", "10", "--quiet"])
    assert _capture_json(capsys) == {"segment": seg_p}
    seg = io.read(seg_p)
    assert seg.shape == (48, 48, 48)

    zip_p = str(tmp_path / "skeletons.zip")
    main(["swc", "--segmentation", seg_p, "--output", zip_p])
    got = _capture_json(capsys)
    assert got["swc"] == zip_p
    with zipfile.ZipFile(zip_p) as zf:
        names = zf.namelist()
    assert len(names) == got["n"]
    for n in names:
        assert n.endswith(".swc")


def test_cli_run_beyond_ram_pipeline(volume_store, tmp_path, capsys):
    work = str(tmp_path / "work")
    zip_p = str(tmp_path / "out.zip")
    main(["run", "--input", volume_store, "--workdir", work,
          "--output", zip_p, "--min-size", "10"] + PATCH)
    got = _capture_json(capsys)
    assert got["run"] == zip_p
    assert set(got["stages_s"]) == {"predict", "segment", "swc"}
    assert os.path.exists(os.path.join(work, "plan.zarr"))
    assert os.path.exists(os.path.join(work, "qaff.zarr"))
    assert io.read(os.path.join(work, "segmentation.zarr")).shape == (
        48, 48, 48
    )
    assert zipfile.ZipFile(zip_p).testzip() is None


def test_cli_predigest_predict_segment(volume_store, tmp_path, capsys):
    """predict --predigest-out + segment --plan/--qaff == float path."""
    affs = str(tmp_path / "affs.zarr")
    main(["predict", "--input", volume_store, "--output", affs] + PATCH)
    capsys.readouterr()
    seg_f = str(tmp_path / "seg_float.zarr")
    main(["segment", "--affinities", affs, "--output", seg_f,
          "--min-size", "10", "--quiet"])
    capsys.readouterr()

    plan_p = str(tmp_path / "plan.zarr")
    qaff_p = str(tmp_path / "qaff.zarr")
    main(["predict", "--input", volume_store,
          "--predigest-out", plan_p, qaff_p] + PATCH)
    assert _capture_json(capsys) == {"predict": [plan_p, qaff_p]}
    assert io.read(plan_p).shape == (48, 48, 48)
    assert io.read(qaff_p).shape == (3, 48, 48, 48)

    seg_d = str(tmp_path / "seg_digest.zarr")
    main(["segment", "--plan", plan_p, "--qaff", qaff_p,
          "--output", seg_d, "--min-size", "10", "--quiet"])
    assert _capture_json(capsys) == {"segment": seg_d}
    np.testing.assert_array_equal(
        np.asarray(io.read(seg_d)), np.asarray(io.read(seg_f))
    )


def test_cli_run_matches_library_path(volume_store, tmp_path, capsys):
    """CLI `run` output labels == direct library dense-path output."""
    from aind_exaspim_neuron_segmentation_tpu import inference

    work = str(tmp_path / "w2")
    main(["run", "--input", volume_store, "--workdir", work,
          "--output", str(tmp_path / "o.zip"), "--min-size", "10"] + PATCH)
    capsys.readouterr()
    cli_seg = np.asarray(io.read(os.path.join(work, "segmentation.zarr")))

    runner = inference.load_model(affinity_mode=True, width_multiplier=0.25)
    vol = np.asarray(io.read(volume_store))
    affs = inference.predict(
        vol, runner, batch_size=4, patch_shape=(32, 32, 32),
        overlap=(16, 16, 16), trim=4, verbose=False,
    )
    lib_seg = inference.affinities_to_segmentation(
        affs, min_segment_size=10
    )
    np.testing.assert_array_equal(cli_seg, lib_seg)


def test_cli_train_one_epoch(tmp_path, capsys):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 400, (48, 48, 48)).astype(np.uint16)
    lab = np.zeros((48, 48, 48), np.uint32)
    lab[10:34, 10:34, 10:34] = 1
    img_p = str(tmp_path / "img.zarr")
    lab_p = str(tmp_path / "lab.zarr")
    io.write_zarr(img_p, img, chunks=(16, 16, 16))
    io.write_zarr(lab_p, lab, chunks=(16, 16, 16))
    out = str(tmp_path / "runs")
    main(["train", "--output", out, "--images", img_p, "--labels", lab_p,
          "--epochs", "1", "--batch-size", "2", "--patch", "32",
          "--width-multiplier", "0.25", "--containment-buffer", "0",
          "--num-workers", "2"])  # exercises the forked sampler path
    got = _capture_json(capsys)
    assert got["train"].startswith(out)
    files = os.listdir(got["train"])
    assert any(f.endswith(".pth") for f in files)


def test_cli_arg_validation(capsys):
    with pytest.raises(SystemExit):
        main(["predict", "--input", "x.zarr"])  # no output
    with pytest.raises(SystemExit):
        main(["segment", "--output", "y.zarr"])  # no input source
    # --output and --predigest-out are mutually exclusive
    with pytest.raises(SystemExit):
        main(["predict", "--input", "x.zarr", "--output", "a.zarr",
              "--predigest-out", "p.zarr", "q.zarr"])
    # --plan/--qaff must come as a pair ...
    with pytest.raises(SystemExit):
        main(["segment", "--affinities", "a.zarr", "--plan", "p.zarr",
              "--output", "y.zarr"])
    # ... and are mutually exclusive with --affinities
    with pytest.raises(SystemExit):
        main(["segment", "--affinities", "a.zarr", "--plan", "p.zarr",
              "--qaff", "q.zarr", "--output", "y.zarr"])
    # run hardcodes affinity mode; --foreground must be rejected
    with pytest.raises(SystemExit):
        main(["run", "--input", "x.zarr", "--workdir", "w",
              "--output", "o.zip", "--foreground"])
    # validation volumes must come as matching pairs
    with pytest.raises(SystemExit):
        main(["train", "--output", "o", "--images", "i.zarr",
              "--labels", "l.zarr", "--val-images", "v.zarr"])
    with pytest.raises(SystemExit):
        main(["train", "--output", "o", "--images", "i.zarr",
              "--labels", "l.zarr", "--val-images", "v.zarr", "w.zarr",
              "--val-labels", "vl.zarr"])
    with pytest.raises(SystemExit) as exc:
        main(["--version"])
    assert exc.value.code == 0
    from aind_exaspim_neuron_segmentation_tpu import __version__
    assert __version__ in capsys.readouterr().out


def test_cli_distributed_flags_single_process(volume_store, tmp_path,
                                              capsys):
    """--distributed on segment/swc takes the sharded engines' n==1
    path in a single-process run and must match the plain commands'
    outputs (the two-real-process transport is pinned by
    tests/test_multiprocess.py)."""
    affs = str(tmp_path / "affs.zarr")
    main(["predict", "--input", volume_store, "--output", affs] + PATCH)
    capsys.readouterr()

    seg_p = str(tmp_path / "seg.zarr")
    seg_d = str(tmp_path / "seg_dist.zarr")
    main(["segment", "--affinities", affs, "--output", seg_p,
          "--min-size", "10", "--quiet"])
    main(["segment", "--affinities", affs, "--output", seg_d,
          "--min-size", "10", "--quiet", "--distributed"])
    got = _capture_json(capsys)
    assert got["segment"] == seg_d
    # the n==1 path honors the protocol-stats contract (zero hub
    # bytes, per-pass walls, dense merge_s instead of the routed
    # route_s/merge_local_s/compose_s)
    (proto,) = got["protocol"]
    for key in ("pass1_s", "stitch_s", "rag_build_s", "merge_s",
                "relabel_s"):
        assert key in proto, f"protocol missing {key}"
    assert proto["bytes_sent"] == 0 and proto["bytes_recv"] == 0
    np.testing.assert_array_equal(io.read(seg_p)[:], io.read(seg_d)[:])

    zip_p = str(tmp_path / "sk.zip")
    zip_d = str(tmp_path / "sk_dist.zip")
    main(["swc", "--segmentation", seg_p, "--output", zip_p])
    main(["swc", "--segmentation", seg_d, "--output", zip_d,
          "--distributed"])
    got = _capture_json(capsys)
    assert got["swc"] == zip_d
    (proto,) = got["protocol"]
    assert "bbox_scan_s" in proto and "crop_pass_s" in proto
    assert proto["bytes_sent"] == 0 and proto["bytes_recv"] == 0
    za, zb = zipfile.ZipFile(zip_p), zipfile.ZipFile(zip_d)
    assert sorted(za.namelist()) == sorted(zb.namelist())
    for name in za.namelist():
        assert za.read(name) == zb.read(name)


def test_cli_run_distributed_single_process(volume_store, tmp_path,
                                            capsys):
    """run --distributed in a single-process job: mesh-sharded
    pre-digest predict over the virtual device mesh, the sharded
    engines' n==1 segment/TEASAR paths, and the zip written by rank 0."""
    work = str(tmp_path / "work")
    zip_p = str(tmp_path / "out.zip")
    main(["run", "--input", volume_store, "--workdir", work,
          "--output", zip_p, "--min-size", "10", "--distributed"]
         + PATCH)
    got = _capture_json(capsys)
    assert got["run"] == zip_p
    (sp,) = got["segment_protocol"]
    (kp,) = got["swc_protocol"]
    assert "merge_s" in sp and "crop_pass_s" in kp
    seg = io.read(os.path.join(work, "segmentation.zarr"))
    assert seg.shape == (48, 48, 48)
    names = set(zipfile.ZipFile(zip_p).namelist())
    labels = np.unique(seg[:])
    assert names == {f"{lab}.swc" for lab in labels if lab}
