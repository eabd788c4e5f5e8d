"""Beyond-RAM proof driver: N^3 zarr affinities -> zarr labels -> SWC zip.

Reproduces BASELINE.md "Round-3 beyond-RAM proof": synthesizes a
(3, N, N, N) float32 affinity store slab-by-slab (never dense; spheres
of high affinity on below-threshold background), then runs the fully
streaming chain -- ``affinities_to_segmentation(lazy, out_path=...)``
(slab-streaming native engine) and ``segmentation_to_zipped_swcs``
(per-label bbox-crop TEASAR) -- while a sampler thread records the RSS
timeline so peaks attribute to phases.

``--ranks K`` (round-5, VERDICT r4 task #3) runs the SAME store through
the multi-process engines instead -- K real ``jax.distributed``
processes over a localhost coordinator driving
``segment_streaming_sharded`` + ``skeletonize_sharded`` -- records each
rank's per-pass walls, hub payload bytes, and peak RSS, and (when the
single-process artifacts exist from a prior run) asserts the
distributed SWC zip is ENTRY-IDENTICAL to the single-process one.

Usage::

    python tools/beyond_ram_proof.py [N] [work_dir] [--ranks K]

Defaults: N=1024, work_dir=/tmp, single-process. Writes
``<work>/proof_aff.zarr`` (kept for re-runs), ``<work>/proof_seg.zarr``
(``proof_seg_dist.zarr`` / ``proof_swcs_dist.zip`` with --ranks),
``<work>/proof_swcs.zip``, and ``<work>/proof_rss.npy`` (the (t, GB)
timeline; ``proof_rank{r}_rss.npy`` with --ranks).
"""

import json
import os
import resource
import subprocess
import sys
import threading
import time
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cur_rss():
    for line in open("/proc/self/status"):
        if line.startswith("VmRSS"):
            return int(line.split()[1]) / 1e6
    return 0.0


class RssSampler:
    """2 s RSS timeline + rusage peak, shared by all proof modes."""

    def __init__(self):
        self.t0 = time.time()
        self.samples = []
        self._stop = threading.Event()
        threading.Thread(target=self._run, daemon=True).start()

    def _run(self):
        while not self._stop.is_set():
            self.samples.append((time.time() - self.t0, cur_rss()))
            self._stop.wait(2.0)

    def stamp(self, msg):
        peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        print(f"[{time.time() - self.t0:7.0f}s cur={cur_rss():5.2f} "
              f"peak={peak:5.2f}GB] {msg}", flush=True)

    def finish(self, npy_path):
        self._stop.set()
        arr = np.asarray(self.samples)
        if len(arr):
            np.save(npy_path, arr)
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def synth_store(n, work, sampler=None):
    """Write the (3, n, n, n) sphere affinity store if absent; return
    its path. Same rng stream as the round-3 proof, so N=1024
    reproduces the recorded store byte-for-byte."""
    from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite

    r, slab = 15, 32
    aff_path = os.path.join(work, "proof_aff.zarr")
    if os.path.exists(os.path.join(aff_path, ".zarray")):
        return aff_path
    rng = np.random.default_rng(0)
    # Sphere density matches the original 1024^3 proof (2560 spheres),
    # scaled with volume.
    n_spheres = max(int(2560 * (n / 1024) ** 3), 8)
    centers = rng.integers(r + 2, n - r - 2, (n_spheres, 3))
    w = zarr_lite.ZarrAppendWriter(
        aff_path, (3, n, n, n), np.float32, chunks=(slab, 256, 256),
    )
    by_slab = {}
    for (cz, cy, cx) in centers:
        for s in range(max(0, (cz - r) // slab),
                       min((n - 1) // slab, (cz + r) // slab) + 1):
            by_slab.setdefault(s, []).append((cz, cy, cx))
    # ceil-div so a trailing partial slab still writes (the append
    # writer's close() verifies full Z coverage; N % slab != 0
    # would otherwise crash after .zarray exists, and a re-run
    # would then segment the incomplete store)
    for s in range(-(-n // slab)):
        z0 = s * slab
        nz = min(slab, n - z0)
        lbl = np.zeros((nz, n, n), bool)
        for (cz, cy, cx) in by_slab.get(s, []):
            zl, zh = max(z0, cz - r), min(z0 + nz, cz + r + 1)
            zz = np.arange(zl, zh)[:, None, None] - cz
            yy = np.arange(cy - r, cy + r + 1)[None, :, None] - cy
            xx = np.arange(cx - r, cx + r + 1)[None, None, :] - cx
            lbl[zl - z0: zh - z0, cy - r: cy + r + 1,
                cx - r: cx + r + 1] |= zz**2 + yy**2 + xx**2 < r**2
        base = np.where(lbl, np.float32(0.9), np.float32(0.02))
        aff = np.empty((3, nz, n, n), np.float32)
        for c in range(3):
            aff[c] = base + rng.uniform(
                -0.05, 0.05, (nz, n, n)).astype(np.float32)
        np.clip(aff, 0.0, 1.0, out=aff)
        w.append(aff)
    w.close()
    if sampler:
        sampler.stamp("affinity zarr written")
    return aff_path


def main_single(n, work):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from aind_exaspim_neuron_segmentation_tpu import inference
    from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite
    from aind_exaspim_neuron_segmentation_tpu.postprocess.streaming import (
        segment_streaming,
    )

    sampler = RssSampler()
    aff_path = synth_store(n, work, sampler)
    lazy = zarr_lite.open_zarr(aff_path)
    sampler.stamp(f"opened lazy handle {lazy.shape}")
    seg_h = segment_streaming(
        lazy, out_path=os.path.join(work, "proof_seg.zarr"),
        tmp_dir=work, verbose=True,
    )
    sampler.stamp("segmentation streamed to zarr")
    zp = os.path.join(work, "proof_swcs.zip")
    inference.segmentation_to_zipped_swcs(seg_h, zp)
    n_swc = len(zipfile.ZipFile(zp).namelist())
    sampler.stamp(f"SWC zip done: {n_swc} skeletons, "
                  f"{os.path.getsize(zp)} bytes")
    peak = sampler.finish(os.path.join(work, "proof_rss.npy"))
    budget = 32
    print(f"PEAK RSS {peak:.2f} GB -- "
          f"{'PASS' if peak < budget else 'FAIL'} (<{budget} GB)")
    arr = np.asarray(sampler.samples)
    print(f"timeline max {arr[:, 1].max():.2f} GB "
          f"at t={arr[arr[:, 1].argmax(), 0]:.0f}s")


def main_worker(rank, port, n, work, ranks):
    """One rank of the --ranks proof: distributed segment + skeletons."""
    os.environ.setdefault("EXA_DIST_HOST", "127.0.0.1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=ranks,
        process_id=rank, local_device_ids=[0],
    )
    from aind_exaspim_neuron_segmentation_tpu import postprocess
    from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite

    sampler = RssSampler()
    lazy = zarr_lite.open_zarr(os.path.join(work, "proof_aff.zarr"))
    seg_p = os.path.join(work, "proof_seg_dist.zarr")
    zp = os.path.join(work, "proof_swcs_dist.zip")
    t0 = time.time()
    seg_stats = {}
    seg_h = postprocess.segment_streaming_sharded(
        lazy, out_path=seg_p, tmp_dir=work, verbose=(rank == 0),
        stats_out=seg_stats,
    )
    t1 = time.time()
    sampler.stamp(f"rank {rank}: distributed segmentation done")
    sk_stats = {}
    postprocess.skeletonize_sharded(seg_h, zip_path=zp,
                                    stats_out=sk_stats)
    t2 = time.time()
    sampler.stamp(f"rank {rank}: distributed skeletonization done")
    peak = sampler.finish(os.path.join(work, f"proof_rank{rank}_rss.npy"))
    with open(os.path.join(work, f"proof_rank{rank}.json"), "w") as f:
        json.dump({
            "rank": rank, "wall_segment_s": round(t1 - t0, 1),
            "wall_skeletonize_s": round(t2 - t1, 1),
            "peak_rss_gb": round(peak, 2),
            "segment_stats": seg_stats.get("ranks", seg_stats),
            "skeletonize_stats": sk_stats.get("ranks", sk_stats),
        }, f, indent=1)


def main_distributed(n, work, ranks):
    import socket

    sampler = RssSampler()
    synth_store(n, work, sampler)
    # Bind-then-close port pick: inherently TOCTOU (the coordinator is
    # a CHILD process, so the live listening socket cannot be handed
    # over the way _rendezvous_address does in-process). SO_REUSEADDR
    # on the probe keeps the port out of TIME_WAIT, and the window to
    # rank 0's jax coordinator bind is milliseconds; on a clash the
    # coordinator fails fast and the wait-all below reports it.
    with socket.socket() as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(r), str(port), str(n), work, str(ranks)],
            env=env,
        )
        for r in range(ranks)
    ]
    # Poll ALL ranks: a crashed rank leaves peers blocked forever in
    # hub collectives, so a sequential wait (or a first-failure
    # assert) would either hang or orphan survivors holding the
    # work_dir and port. On the first nonzero exit, terminate the
    # rest, then report every exit code.
    pending = set(procs)
    failed = False
    while pending and not failed:
        for p in list(pending):
            rc = p.poll()
            if rc is not None:
                pending.discard(p)
                failed = failed or rc != 0
        if pending and not failed:
            time.sleep(0.5)
    if failed:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            p.wait()
        raise AssertionError(
            f"rank failure, exit codes {[p.returncode for p in procs]}"
        )
    sampler.stamp(f"all {ranks} ranks done")
    # Per-rank table
    rows = [json.load(open(os.path.join(work, f"proof_rank{r}.json")))
            for r in range(ranks)]
    print(f"{'rank':>4} {'segment_s':>10} {'skeleton_s':>11} "
          f"{'peak_rss_gb':>12}")
    for row in rows:
        print(f"{row['rank']:>4} {row['wall_segment_s']:>10} "
              f"{row['wall_skeletonize_s']:>11} {row['peak_rss_gb']:>12}")
    print("rank-0 protocol stats:",
          json.dumps(rows[0]["segment_stats"], indent=1))
    print("rank-0 skeleton stats:",
          json.dumps(rows[0]["skeletonize_stats"], indent=1))
    # Entry-identity against the single-process artifacts, if present
    zp_single = os.path.join(work, "proof_swcs.zip")
    zp_dist = os.path.join(work, "proof_swcs_dist.zip")
    if os.path.exists(zp_single):
        zs, zd = zipfile.ZipFile(zp_single), zipfile.ZipFile(zp_dist)
        assert sorted(zs.namelist()) == sorted(zd.namelist()), \
            "SWC zip entry sets differ"
        for name in zs.namelist():
            assert zs.read(name) == zd.read(name), f"{name} differs"
        print(f"SWC zips ENTRY-IDENTICAL: {len(zs.namelist())} skeletons "
              "match the single-process proof byte-for-byte")
    else:
        print(f"(no {zp_single}; run the single-process proof first "
              "for the identity check)")


def main():
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--worker":
        rank, port, n, work, ranks = argv[1:6]
        main_worker(int(rank), int(port), int(n), work, int(ranks))
        return
    ranks = 1
    if "--ranks" in argv:
        i = argv.index("--ranks")
        ranks = int(argv[i + 1])
        del argv[i: i + 2]
    n = int(argv[0]) if len(argv) > 0 else 1024
    work = argv[1] if len(argv) > 1 else "/tmp"
    if ranks > 1:
        main_distributed(n, work, ranks)
    else:
        main_single(n, work)


if __name__ == "__main__":
    main()
