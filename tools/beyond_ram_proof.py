"""Beyond-RAM proof driver: N^3 zarr affinities -> zarr labels -> SWC zip.

Reproduces BASELINE.md "Round-3 beyond-RAM proof": synthesizes a
(3, N, N, N) float32 affinity store slab-by-slab (never dense; spheres
of high affinity on below-threshold background), then runs the fully
streaming chain -- ``affinities_to_segmentation(lazy, out_path=...)``
(slab-streaming native engine) and ``segmentation_to_zipped_swcs``
(per-label bbox-crop TEASAR) -- while a sampler thread records the RSS
timeline so peaks attribute to phases.

Usage::

    python tools/beyond_ram_proof.py [N] [work_dir]

Defaults: N=1024, work_dir=/tmp. Writes ``<work>/proof_aff.zarr`` (kept
for re-runs), ``<work>/proof_seg.zarr``, ``<work>/proof_swcs.zip``, and
``<work>/proof_rss.npy`` (the (t, GB) timeline).
"""

import os
import resource
import sys
import threading
import time
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

from aind_exaspim_neuron_segmentation_tpu import inference
from aind_exaspim_neuron_segmentation_tpu.io import zarr_lite
from aind_exaspim_neuron_segmentation_tpu.postprocess.streaming import (
    segment_streaming,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    r, slab = 15, 32
    aff_path = os.path.join(work, "proof_aff.zarr")
    t0 = time.time()
    samples = []
    stop = threading.Event()

    def cur_rss():
        for line in open("/proc/self/status"):
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
        return 0.0

    def sampler():
        while not stop.is_set():
            samples.append((time.time() - t0, cur_rss()))
            stop.wait(2.0)

    threading.Thread(target=sampler, daemon=True).start()

    def stamp(msg):
        peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        print(f"[{time.time() - t0:7.0f}s cur={cur_rss():5.2f} "
              f"peak={peak:5.2f}GB] {msg}", flush=True)

    rng = np.random.default_rng(0)
    # Sphere density matches the original 1024^3 proof (2560 spheres),
    # scaled with volume -- same rng stream, so N=1024 reproduces the
    # recorded store byte-for-byte.
    n_spheres = max(int(2560 * (n / 1024) ** 3), 8)
    centers = rng.integers(r + 2, n - r - 2, (n_spheres, 3))
    if not os.path.exists(os.path.join(aff_path, ".zarray")):
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
        stamp("affinity zarr written")

    lazy = zarr_lite.open_zarr(aff_path)
    stamp(f"opened lazy handle {lazy.shape}")
    seg_h = segment_streaming(
        lazy, out_path=os.path.join(work, "proof_seg.zarr"),
        tmp_dir=work, verbose=True,
    )
    stamp("segmentation streamed to zarr")
    zp = os.path.join(work, "proof_swcs.zip")
    inference.segmentation_to_zipped_swcs(seg_h, zp)
    n_swc = len(zipfile.ZipFile(zp).namelist())
    stamp(f"SWC zip done: {n_swc} skeletons, {os.path.getsize(zp)} bytes")
    stop.set()
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    budget = 32
    print(f"PEAK RSS {peak:.2f} GB -- "
          f"{'PASS' if peak < budget else 'FAIL'} (<{budget} GB)")
    arr = np.asarray(samples)
    np.save(os.path.join(work, "proof_rss.npy"), arr)
    print(f"timeline max {arr[:, 1].max():.2f} GB "
          f"at t={arr[arr[:, 1].argmax(), 0]:.0f}s")


if __name__ == "__main__":
    main()
