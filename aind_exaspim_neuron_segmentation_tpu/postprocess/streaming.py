"""Beyond-RAM affinity -> segmentation driver over the streaming engine.

Streams a lazy chunked affinity handle (zarr/N5, shape (3, D, H, W))
through three Z-slab passes (native ``streamseg.cpp`` via
:class:`..native.StreamSegmenter`):

1. device pre-digest (:func:`..ops.predigest.predigest_slab`) + slab
   watershed; provisional fragment labels and u8 affinities park in
   temp memmaps (7 bytes/voxel of DISK, not RAM);
2. streamed RAG build + the shared merge loop + threshold/min-size
   lut composition;
3. relabel slabs through the lut into a dense array or a Zarr store.

Peak host RAM is O(RAG + slab): none of the float volume, the digests,
the fragment volume, or a voxel-granular union-find is ever dense in
memory -- the dense engine's ~16 bytes/voxel of transient state becomes
~7 bytes/voxel of sequentially-accessed temp disk. Output is
bit-identical to the dense path (reference inference.py:196-237 +
utils/img_util.py:536-559 semantics; pinned by tests/test_streamseg.py).
"""

import ctypes
import mmap as _mmap
import os
import shutil
import tempfile

import numpy as np

from aind_exaspim_neuron_segmentation_tpu import native

_libc = ctypes.CDLL(None, use_errno=True)
_MS_ASYNC = 1
_MADV_DONTNEED = 4


def _drop_pages(arr):
    """Schedule writeback + evict a memmap slab from resident memory.

    Dirty file-backed pages count toward RSS until the kernel writes
    them back, so a streaming pass that writes a whole volume of temp
    memmap would LOOK like it held the volume in RAM. msync(MS_ASYNC)
    schedules the slab's writeback without blocking the compute path;
    madvise(MADV_DONTNEED) then evicts the range (for MAP_SHARED file
    mappings the kernel preserves not-yet-written dirty data --
    verified empirically; later passes refault from disk on demand).
    Best-effort: errors are ignored (the data is correct either way --
    this only tightens the resident-set footprint).
    """
    addr = arr.ctypes.data
    length = arr.nbytes
    page = _mmap.PAGESIZE
    start = addr - (addr % page)
    length += addr - start
    _libc.msync(ctypes.c_void_p(start), ctypes.c_size_t(length), _MS_ASYNC)
    _libc.madvise(
        ctypes.c_void_p(start), ctypes.c_size_t(length), _MADV_DONTNEED
    )


def segment_streaming(
    affinities,
    agglomeration_thresholds=(0.6, 0.8, 0.9),
    min_segment_size=100,
    aff_threshold_low=0.1,
    aff_threshold_high=0.9999,
    quantile_pct=85,
    out_path=None,
    tmp_dir=None,
    slab_planes=None,
    verbose=False,
):
    """Lazy (3, D, H, W) affinity handle -> final-threshold segmentation.

    ``out_path``: when set, the labeling streams into a Zarr store there
    (uint32, Z-slab chunks) and the opened lazy handle is returned;
    otherwise a dense uint32 array is returned (RAM permitting --
    4 bytes/voxel for the result only).

    ``tmp_dir``: directory for the two temp memmaps (~7 bytes/voxel,
    deleted on return). ``slab_planes``: Z planes per slab (default
    sizes the device digest slab to ~512 MB of f32). ``verbose``:
    stderr stamps at each phase boundary.

    ``affinities`` may also be a ``(plan, qaff)`` PAIR of lazy handles,
    e.g. from ``predict(..., predigest=True, out_path=(p1, p2))``: the
    TPU already digested the volume, so pass 1 replays pure integer
    work straight from the plan store (no device involvement, no qaff
    temp -- the qaff store is re-read in pass 2) and the low/high
    thresholds must be the defaults baked in at digest time.

    Requires ``aff_threshold_low <= aff_threshold_high`` (the pipeline
    default): the slab watershed's cross-boundary stitching relies on
    background voxels never joining fragments, which only >= low
    unions guarantee (streamseg.cpp header note).
    """
    digest_pair = isinstance(affinities, (tuple, list))
    if digest_pair:
        plan_h, qaff_h = affinities
        if (aff_threshold_low, aff_threshold_high) != (0.1, 0.9999):
            raise ValueError(
                "aff thresholds are baked into the plan bytes at digest "
                "time; re-digest for non-defaults"
            )
        if plan_h.ndim != 3 or qaff_h.shape != (3,) + tuple(plan_h.shape):
            raise ValueError(
                f"digest pair shapes {plan_h.shape} / {qaff_h.shape} "
                "do not match"
            )
        d, h, w = plan_h.shape
    else:
        if affinities.ndim != 4 or affinities.shape[0] != 3:
            raise ValueError(
                f"expected (3, D, H, W) handle, got {affinities.shape}"
            )
        _, d, h, w = affinities.shape
    if aff_threshold_low > aff_threshold_high:
        raise ValueError(
            "streaming segmentation requires aff_threshold_low <= "
            "aff_threshold_high"
        )
    th = list(agglomeration_thresholds)
    if not th or any(b < a for a, b in zip(th, th[1:])):
        raise ValueError("thresholds must be non-empty and ascending")

    if slab_planes is None:
        budget = 512 * 1024**2
        slab_planes = max(int(budget // (3 * h * w * 4)), 1)

    import sys
    import time

    t0 = time.time()

    def stamp(msg):
        if verbose:
            print(f"[segment_streaming {time.time() - t0:7.0f}s] {msg}",
                  file=sys.stderr, flush=True)

    work = tempfile.mkdtemp(prefix="exa_streamseg_", dir=tmp_dir)
    try:
        frag_mm = np.memmap(
            os.path.join(work, "frag.u32"), np.uint32, "w+", shape=(d, h, w)
        )
        seg = native.StreamSegmenter((d, h, w))

        if digest_pair:
            # Pass 1: pure integer replay from the plan store.
            qaff_mm = None
            for lo in range(0, d, slab_planes):
                hi = min(lo + slab_planes, d)
                frag_mm[lo:hi] = seg.feed(
                    np.asarray(plan_h[lo:hi], dtype=np.uint8)
                )
                _drop_pages(frag_mm[lo:hi])
        else:
            import jax.numpy as jnp

            from aind_exaspim_neuron_segmentation_tpu.ops.predigest import (
                predigest_slab,
            )

            # Plane-major qaff so slab slices stay contiguous for
            # rag_feed.
            qaff_mm = np.memmap(
                os.path.join(work, "qaff.u8"), np.uint8, "w+",
                shape=(d, 3, h, w),
            )
            # Pass 1: digest on device, watershed + stitch on host.
            prev = None
            for lo in range(0, d, slab_planes):
                hi = min(lo + slab_planes, d)
                block = jnp.asarray(
                    np.asarray(affinities[:, lo:hi], dtype=np.float32)
                )
                plan, qaff = predigest_slab(
                    block, prev, first_slab=(lo == 0), last_slab=(hi == d),
                    low=aff_threshold_low, high=aff_threshold_high,
                )
                prev = block[0, -1]
                frag_mm[lo:hi] = seg.feed(np.asarray(plan))
                qaff_mm[lo:hi] = np.moveaxis(np.asarray(qaff), 0, 1)
                _drop_pages(frag_mm[lo:hi])
                _drop_pages(qaff_mm[lo:hi])
            del prev, block, plan, qaff
        stamp("pass 1 (digest + watershed + stitch) done")
        seg.fragments_done()
        stamp(f"fragments stitched: K={seg.n_fragments}")

        # Pass 2: streamed RAG build, then merge + lut composition.
        for lo in range(0, d, slab_planes):
            hi = min(lo + slab_planes, d)
            if qaff_mm is not None:
                q_slab = qaff_mm[lo:hi]
            else:
                q_slab = np.moveaxis(
                    np.asarray(qaff_h[:, lo:hi], dtype=np.uint8), 0, 1
                )
            seg.rag_feed(frag_mm[lo:hi], q_slab)
            _drop_pages(frag_mm[lo:hi])
            if qaff_mm is not None:
                _drop_pages(qaff_mm[lo:hi])
        stamp("pass 2 (RAG build) done")
        seg.merge(
            th, quantile_pct=quantile_pct,
            min_segment_size=min_segment_size,
        )
        stamp(f"merge done: n_segments={seg.n_segments}")

        # Pass 3: relabel.
        if out_path is not None:
            from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
                ZarrAppendWriter, open_zarr,
            )

            writer = ZarrAppendWriter(out_path, (d, h, w), np.uint32)
            for lo in range(0, d, slab_planes):
                hi = min(lo + slab_planes, d)
                writer.append(seg.map(frag_mm[lo:hi]))
                _drop_pages(frag_mm[lo:hi])
            writer.close()
            seg.close()
            return open_zarr(out_path)
        out = np.empty((d, h, w), np.uint32)
        for lo in range(0, d, slab_planes):
            hi = min(lo + slab_planes, d)
            out[lo:hi] = seg.map(frag_mm[lo:hi])
        seg.close()
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
