"""Command-line interface: the README workflows as one-line commands.

The reference package has no CLI (entry is via Python imports only;
reference README.md:43-117) -- this is a beyond-parity convenience
wrapping the same public API, aimed at production batch jobs:

    python -m aind_exaspim_neuron_segmentation_tpu predict \\
        --input vol.zarr --model weights.pth --output affs.zarr
    python -m aind_exaspim_neuron_segmentation_tpu segment \\
        --affinities affs.zarr --output seg.zarr
    python -m aind_exaspim_neuron_segmentation_tpu swc \\
        --segmentation seg.zarr --output skeletons.zip
    python -m aind_exaspim_neuron_segmentation_tpu run \\
        --input vol.zarr --model weights.pth --workdir /tmp/job \\
        --output skeletons.zip
    python -m aind_exaspim_neuron_segmentation_tpu train \\
        --output runs/ --images a.zarr b.zarr --labels la.zarr lb.zarr

Every path accepts what :func:`..io.read` accepts (zarr / N5 / TIFF,
local or gs:// / s3://); volume outputs stream to Zarr stores, so
beyond-RAM volumes work end to end (`run` uses the on-device pre-digest
+ streaming segmentation pipeline throughout).
"""

import argparse
import json
import os
import time


def _emit(obj):
    """Print the command's ONE machine-readable result line.

    Under ``--distributed`` every process runs the same command; only
    rank 0 emits the line (n duplicate JSON lines would break any
    consumer parsing the documented single-line contract).
    """
    import jax

    if jax.distributed.is_initialized() and jax.process_index() != 0:
        return
    print(json.dumps(obj))


def _triple(text):
    """'96' or '96,96,96' -> (96, 96, 96)."""
    parts = [int(p) for p in text.replace("x", ",").split(",")]
    if len(parts) == 1:
        parts = parts * 3
    if len(parts) != 3:
        raise argparse.ArgumentTypeError(f"expected 1 or 3 ints: {text!r}")
    return tuple(parts)


def _read(path):
    from aind_exaspim_neuron_segmentation_tpu import io

    return io.read(path)


def _add_predict_args(p):
    p.add_argument("--model", default=None,
                   help=".pth checkpoint (default: random weights)")
    p.add_argument("--foreground", action="store_true",
                   help="1-channel foreground mode instead of affinities")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--patch", type=_triple, default=(96, 96, 96),
                   metavar="D,H,W")
    p.add_argument("--overlap", type=_triple, default=(32, 32, 32),
                   metavar="D,H,W")
    p.add_argument("--trim", type=int, default=8)
    p.add_argument("--brightness-clip", type=float, default=1000)
    p.add_argument("--blend", choices=("uniform", "gaussian"),
                   default="uniform")
    p.add_argument("--width-multiplier", type=float, default=1,
                   help="channel-ladder scale (must match the checkpoint)")


def cmd_predict(args):
    """Volume -> affinity Zarr store (or pre-digest plan+qaff stores)."""
    from aind_exaspim_neuron_segmentation_tpu import inference

    if args.distributed:
        # must precede load_model: anything touching the XLA backend
        # (even jax.default_backend) locks out jax.distributed.initialize
        from aind_exaspim_neuron_segmentation_tpu import parallel

        parallel.initialize_distributed()
    runner = inference.load_model(
        args.model, affinity_mode=not args.foreground,
        width_multiplier=args.width_multiplier,
    )
    img = _read(args.input)
    kw = dict(
        affinity_mode=not args.foreground,
        batch_size=args.batch_size,
        brightness_clip=args.brightness_clip,
        patch_shape=args.patch,
        overlap=args.overlap,
        trim=args.trim,
        blend_mode=args.blend,
        out_path=(tuple(args.predigest_out) if args.predigest_out
                  else args.output),
        predigest=bool(args.predigest_out),
    )
    if args.distributed:
        # Mesh-sharded sliding window across every device of the
        # jax.distributed job (same command on every process; each
        # writes only its own Z rows into the shared store).
        from aind_exaspim_neuron_segmentation_tpu import parallel

        out = parallel.predict_sharded(
            img, runner, mesh=parallel.make_mesh(), **kw
        )
    else:
        out = inference.predict(img, runner, verbose=not args.quiet, **kw)
    del out
    where = (args.predigest_out if args.predigest_out else args.output)
    _emit({"predict": where})


def cmd_segment(args):
    """Affinities (float store or digest pair) -> label Zarr store."""
    from aind_exaspim_neuron_segmentation_tpu import inference

    if args.plan:
        affs = (_read(args.plan), _read(args.qaff))
    else:
        affs = _read(args.affinities)
    if args.distributed:
        # Same command on every process of a jax.distributed job
        # (coordinator via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
        # JAX_PROCESS_ID env vars); single-process runs take the n==1
        # path of the same engine.
        from aind_exaspim_neuron_segmentation_tpu import parallel, postprocess

        parallel.initialize_distributed()
        stats = {}
        postprocess.segment_streaming_sharded(
            affs,
            agglomeration_thresholds=tuple(args.thresholds),
            min_segment_size=args.min_size,
            out_path=args.output,
            verbose=not args.quiet,
            stats_out=stats,
        )
        # transport vs compute, separable per rank on any pod run
        # (the same stats_out ledger bench.py --e2e --sharded records)
        _emit({"segment": args.output, "protocol": stats.get("ranks")})
    else:
        inference.affinities_to_segmentation(
            affs,
            agglomeration_thresholds=tuple(args.thresholds),
            min_segment_size=args.min_size,
            out_path=args.output,
            verbose=not args.quiet,
        )
        _emit({"segment": args.output})


def cmd_swc(args):
    """Segmentation store -> zipped SWC skeletons."""
    from aind_exaspim_neuron_segmentation_tpu import inference

    seg = _read(args.segmentation)
    if args.distributed:
        from aind_exaspim_neuron_segmentation_tpu import parallel, postprocess

        parallel.initialize_distributed()
        # each rank returns only ITS labels' skeletons; rank 0 streams
        # the zip from the ranks' SWC texts (no full-table broadcast)
        stats = {}
        skeletons = postprocess.skeletonize_sharded(
            seg, anisotropy=tuple(args.anisotropy),
            zip_path=args.output, stats_out=stats,
        )
        n = stats.get("n_skeletons", len(skeletons))
        _emit({"swc": args.output, "n": n,
               "protocol": stats.get("ranks")})
    else:
        skeletons = inference.segmentation_to_zipped_swcs(
            seg, args.output, anisotropy=tuple(args.anisotropy)
        )
        _emit({"swc": args.output, "n": len(skeletons)})


def cmd_run(args):
    """input volume -> pre-digest predict -> streaming segment -> SWC zip.

    The whole pipeline is the beyond-RAM configuration: digests and the
    segmentation live in Zarr stores under --workdir, never dense in
    host RAM (BASELINE.md round-3 slab-streaming engine).

    ``--distributed``: every stage runs across the processes of a
    ``jax.distributed`` job (same command on every process; --workdir
    must be a shared filesystem): mesh-sharded on-chip pre-digest
    (``parallel.predict_sharded``), multi-process streaming
    segmentation, and distributed TEASAR, with rank 0 writing the zip.
    """
    from aind_exaspim_neuron_segmentation_tpu import inference

    os.makedirs(args.workdir, exist_ok=True)
    plan_p = os.path.join(args.workdir, "plan.zarr")
    qaff_p = os.path.join(args.workdir, "qaff.zarr")
    seg_p = os.path.join(args.workdir, "segmentation.zarr")

    if args.distributed:
        # must precede load_model: anything touching the XLA backend
        # locks out jax.distributed.initialize
        from aind_exaspim_neuron_segmentation_tpu import parallel, postprocess

        parallel.initialize_distributed()
    runner = inference.load_model(
        args.model, affinity_mode=True,
        width_multiplier=args.width_multiplier,
    )
    img = _read(args.input)
    t0 = time.time()
    predict_kw = dict(
        batch_size=args.batch_size,
        brightness_clip=args.brightness_clip,
        patch_shape=args.patch, overlap=args.overlap, trim=args.trim,
        blend_mode=args.blend,
        predigest=True, out_path=(plan_p, qaff_p),
    )
    if args.distributed:
        plan, qaff = parallel.predict_sharded(
            img, runner, mesh=parallel.make_mesh(), **predict_kw
        )
    else:
        plan, qaff = inference.predict(
            img, runner, verbose=not args.quiet, **predict_kw
        )
    t1 = time.time()
    seg_kw = dict(
        agglomeration_thresholds=tuple(args.thresholds),
        min_segment_size=args.min_size,
        out_path=seg_p,
        verbose=not args.quiet,
    )
    seg_stats, sk_stats = {}, {}
    if args.distributed:
        seg = postprocess.segment_streaming_sharded(
            (plan, qaff), stats_out=seg_stats, **seg_kw
        )
    else:
        seg = inference.affinities_to_segmentation((plan, qaff), **seg_kw)
    t2 = time.time()
    if args.distributed:
        postprocess.skeletonize_sharded(
            seg, anisotropy=tuple(args.anisotropy), zip_path=args.output,
            stats_out=sk_stats,
        )
    else:
        inference.segmentation_to_zipped_swcs(
            seg, args.output, anisotropy=tuple(args.anisotropy)
        )
    t3 = time.time()
    out = {
        "run": args.output,
        "stages_s": {"predict": round(t1 - t0, 1),
                     "segment": round(t2 - t1, 1),
                     "swc": round(t3 - t2, 1)},
        "workdir": args.workdir,
    }
    if args.distributed:
        # per-rank per-pass walls + hub payload bytes for both
        # distributed stages -- transport vs compute on any pod run
        out["segment_protocol"] = seg_stats.get("ranks")
        out["swc_protocol"] = sk_stats.get("ranks")
    _emit(out)


def cmd_train(args):
    """Train UNet3D on image/label volume pairs (reference train loop)."""
    from aind_exaspim_neuron_segmentation_tpu.machine_learning import (
        data_handling,
    )
    from aind_exaspim_neuron_segmentation_tpu.machine_learning.train import (
        Trainer,
    )

    if len(args.images) != len(args.labels):
        raise SystemExit("--images and --labels must pair up")
    mesh = None
    output = args.output
    if args.distributed or args.mesh:
        from aind_exaspim_neuron_segmentation_tpu import parallel

        if args.distributed:
            import jax

            parallel.initialize_distributed()
            if jax.process_index() != 0:
                # one writer per artifact: peers keep their (identical,
                # deterministic) checkpoints/events out of rank 0's way
                output = os.path.join(
                    args.output, f".rank{jax.process_index()}"
                )
        mesh = parallel.make_mesh(args.mesh)  # None -> every device
    common = dict(
        affinity_mode=not args.foreground,
        patch_shape=args.patch,
        brightness_clip=args.brightness_clip,
    )
    # Default: raw label patches -> the Trainer auto-enables on-device
    # augmentation (+ the raw-u16 wire when the volumes qualify) -- the
    # measured-fastest path (BASELINE.md train-step wire diet).
    # --host-augment restores host-side ImageTransforms.
    train_ds = data_handling.TrainDataset(
        list(args.images), list(args.labels),
        transform=args.host_augment,
        return_label_patches=not args.host_augment,
        seed=args.seed, **common,
    )
    val_ds = data_handling.ValidateDataset(
        list(args.val_images or args.images),
        list(args.val_labels or args.labels),
        containment_buffer=args.containment_buffer,
        **common,
    )
    trainer = Trainer(
        output,
        affinity_mode=not args.foreground,
        batch_size=args.batch_size,
        lr=args.lr,
        max_epochs=args.epochs,
        width_multiplier=args.width_multiplier,
        seed=args.seed,
        mesh=mesh,
        num_workers=args.num_workers,
    )
    trainer.run(train_ds, val_ds)
    _emit({"train": trainer.log_dir})


def build_parser():
    """Build the top-level argparse parser with all five subcommands."""
    from aind_exaspim_neuron_segmentation_tpu import __version__

    top = argparse.ArgumentParser(
        prog="python -m aind_exaspim_neuron_segmentation_tpu",
        description=__doc__.split("\n\n")[0],
    )
    top.add_argument("--version", action="version",
                     version=f"%(prog)s {__version__}")
    top.add_argument(
        "--platform", choices=("cpu", "tpu"), default=None,
        help="force the JAX platform (jax.config jax_platforms; the "
             "JAX_PLATFORMS env var is ignored by some PJRT plugins). "
             "Goes BEFORE the subcommand.",
    )
    sub = top.add_subparsers(dest="command", required=True)

    p = sub.add_parser("predict", help="volume -> affinity Zarr store")
    p.add_argument("--input", required=True)
    p.add_argument("--output", help="output .zarr path (float affinities)")
    p.add_argument(
        "--predigest-out", nargs=2, metavar=("PLAN", "QAFF"),
        help="stream on-device digests to these two .zarr paths instead "
             "of float affinities (4 bytes/voxel instead of 12)",
    )
    _add_predict_args(p)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="mesh-sharded sliding window across every "
                        "device of a jax.distributed job (same command "
                        "on every process; each writes its own Z rows "
                        "into the shared --output store; coordinator "
                        "via JAX_COORDINATOR_ADDRESS etc.)")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("segment",
                       help="affinities (or digests) -> label Zarr store")
    p.add_argument("--affinities", help="float (3,D,H,W) zarr/N5 store")
    p.add_argument("--plan", help="pre-digest plan store (with --qaff)")
    p.add_argument("--qaff", help="pre-digest qaff store (with --plan)")
    p.add_argument("--output", required=True, help="output .zarr path")
    p.add_argument("--thresholds", type=float, nargs="+",
                   default=(0.6, 0.8, 0.9))
    p.add_argument("--min-size", type=int, default=100)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="run the streaming engine across the processes "
                        "of a jax.distributed job (same command on "
                        "every process; coordinator via "
                        "JAX_COORDINATOR_ADDRESS etc.)")
    p.set_defaults(fn=cmd_segment)

    p = sub.add_parser("swc", help="segmentation -> zipped SWC skeletons")
    p.add_argument("--segmentation", required=True)
    p.add_argument("--output", required=True, help="output .zip path")
    p.add_argument("--anisotropy", type=float, nargs=3, default=(1, 1, 1))
    p.add_argument("--distributed", action="store_true",
                   help="Z-partitioned bbox scan + label-partitioned "
                        "TEASAR across the processes of a "
                        "jax.distributed job (rank 0 writes the zip)")
    p.set_defaults(fn=cmd_swc)

    p = sub.add_parser(
        "run", help="volume -> segmentation -> SWC zip (beyond-RAM path)"
    )
    p.add_argument("--input", required=True)
    p.add_argument("--workdir", required=True,
                   help="directory for the intermediate Zarr stores")
    p.add_argument("--output", required=True, help="output SWC .zip path")
    _add_predict_args(p)
    p.add_argument("--thresholds", type=float, nargs="+",
                   default=(0.6, 0.8, 0.9))
    p.add_argument("--min-size", type=int, default=100)
    p.add_argument("--anisotropy", type=float, nargs=3, default=(1, 1, 1))
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="run every stage across the processes of a "
                        "jax.distributed job (mesh-sharded predict, "
                        "multi-process segment + TEASAR; --workdir on "
                        "a shared filesystem; rank 0 writes the zip)")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("train", help="train UNet3D on volume/label pairs")
    p.add_argument("--output", required=True, help="runs directory")
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--labels", nargs="+", required=True)
    p.add_argument("--val-images", nargs="+")
    p.add_argument("--val-labels", nargs="+")
    p.add_argument("--foreground", action="store_true")
    p.add_argument("--patch", type=_triple, default=(96, 96, 96),
                   metavar="D,H,W")
    p.add_argument("--brightness-clip", type=float, default=300)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--width-multiplier", type=float, default=1)
    p.add_argument("--containment-buffer", type=int, default=64,
                   help="validation-grid center containment margin "
                        "(reference default 64; use 0 for small volumes)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--host-augment", action="store_true",
                   help="augment on the host (ImageTransforms) instead "
                        "of the default on-device augmentation pipeline")
    p.add_argument("--num-workers", type=int, default=0, metavar="N",
                   help="fork N GIL-free sampler processes per host "
                        "(torch DataLoader-workers role; 0 = one "
                        "producer thread, bit-reproducible streams "
                        "either way)")
    p.add_argument("--mesh", type=int, default=None, metavar="N",
                   help="data-parallel Trainer(mesh=) over the first N "
                        "devices (default with --distributed: all "
                        "devices of the job)")
    p.add_argument("--distributed", action="store_true",
                   help="initialize the jax.distributed runtime first "
                        "(same command on every process; batches shard "
                        "over the joint device mesh, gradient psum "
                        "rides the cross-process runtime; rank 0 owns "
                        "--output)")
    p.set_defaults(fn=cmd_train)
    return top


def main(argv=None):
    """Parse ``argv`` (default ``sys.argv[1:]``) and run the subcommand."""
    args = build_parser().parse_args(argv)
    if args.platform:
        # must precede any jax backend use (the subcommands all import
        # jax lazily, so this is the first touch)
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.command == "predict":
        if not (args.output or args.predigest_out):
            raise SystemExit("predict needs --output or --predigest-out")
        if args.output and args.predigest_out:
            raise SystemExit(
                "predict takes --output OR --predigest-out, not both"
            )
    if args.command == "segment":
        if (args.plan is None) != (args.qaff is None):
            raise SystemExit("--plan and --qaff must be given together")
        if args.affinities and args.plan:
            raise SystemExit(
                "segment takes --affinities OR --plan/--qaff, not both"
            )
        if not (args.affinities or args.plan):
            raise SystemExit(
                "segment needs --affinities or --plan + --qaff"
            )
    if args.command == "run" and args.foreground:
        raise SystemExit(
            "run is the affinity->segmentation pipeline; foreground "
            "output cannot feed segmentation (use `predict --foreground`)"
        )
    if args.command == "train":
        if (args.val_images is None) != (args.val_labels is None):
            raise SystemExit(
                "--val-images and --val-labels must be given together"
            )
        if args.val_images and len(args.val_images) != len(args.val_labels):
            raise SystemExit("--val-images and --val-labels must pair up")
    args.fn(args)


if __name__ == "__main__":
    main()
