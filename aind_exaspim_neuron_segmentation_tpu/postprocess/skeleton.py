"""Skeleton container + TEASAR driver + SWC serialization.

Plays the role of kimimaro's ``Skeleton`` at the reference call sites:
``.vertices`` (N, 3) in physical units (index * anisotropy -- voxel
coordinates when anisotropy is (1, 1, 1), which is what
``voxelize_skeletons`` at reference inference.py:313-336 assumes) and
``.to_swc()`` producing the text written into the ZIP archive
(reference inference.py:294-310).
"""

import ctypes
from dataclasses import dataclass, field

import numpy as np

from aind_exaspim_neuron_segmentation_tpu.native import build


@dataclass
class Skeleton:
    """A skeleton graph: vertices in physical (z, y, x), radii, edges."""

    id: int
    vertices: np.ndarray  # (N, 3) float64
    radii: np.ndarray  # (N,) float64
    edges: np.ndarray  # (E, 2) int64
    swc_header: str = field(default="", repr=False)

    def to_swc(self):
        """SWC text: ``n T x y z R parent`` rows, 1-indexed.

        The vertex graph (a forest of trace trees) is rooted at vertex 0
        by BFS; disconnected pieces get parent -1. Column order mirrors
        the vertex axis order so ``voxelize_skeletons`` round-trips.
        """
        n = len(self.radii)
        adj = [[] for _ in range(n)]
        for a, b in self.edges:
            adj[a].append(b)
            adj[b].append(a)
        from collections import deque

        parent = np.full(n, -2, np.int64)
        order = []
        for seed in range(n):
            if parent[seed] != -2:
                continue
            parent[seed] = -1
            queue = deque([seed])  # list.pop(0) is O(n) per pop
            while queue:
                u = queue.popleft()
                order.append(u)
                for v in adj[u]:
                    if parent[v] == -2:
                        parent[v] = u
                        queue.append(v)
        new_id = np.empty(n, np.int64)
        for i, u in enumerate(order):
            new_id[u] = i + 1
        lines = [self.swc_header] if self.swc_header else []
        for u in order:
            p = -1 if parent[u] < 0 else int(new_id[parent[u]])
            x, y, z = self.vertices[u]
            lines.append(
                f"{int(new_id[u])} 0 {x:g} {y:g} {z:g} "
                f"{self.radii[u]:g} {p}"
            )
        return "\n".join(lines) + "\n"

    @classmethod
    def from_swc(cls, text, id=0):
        """Parse SWC text back into a Skeleton (round-trip oracle)."""
        verts, radii, edges, ids = [], [], [], {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            f = line.split()
            ids[int(f[0])] = len(verts)
            verts.append((float(f[2]), float(f[3]), float(f[4])))
            radii.append(float(f[5]))
            parent = int(f[6])
            if parent != -1:
                edges.append((ids[parent], ids[int(f[0])]))
        return cls(
            id=id,
            vertices=np.asarray(verts, np.float64).reshape(-1, 3),
            radii=np.asarray(radii, np.float64),
            edges=np.asarray(edges, np.int64).reshape(-1, 2),
        )


def _bind(lib):
    if getattr(lib, "_exa_skel_bound", False):
        return lib
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.exa_skeletonize.restype = ctypes.c_void_p
    lib.exa_skeletonize.argtypes = [
        u32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f64p,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.exa_skeletonize_crop.restype = ctypes.c_void_p
    lib.exa_skeletonize_crop.argtypes = [
        u32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint32, f64p, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.exa_label_bboxes.restype = ctypes.c_int64
    lib.exa_label_bboxes.argtypes = [
        u32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, i64p, i64p,
    ]
    lib.exa_skel_count.restype = ctypes.c_int64
    lib.exa_skel_count.argtypes = [ctypes.c_void_p]
    lib.exa_skel_label.restype = ctypes.c_uint32
    lib.exa_skel_label.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.exa_skel_nverts.restype = ctypes.c_int64
    lib.exa_skel_nverts.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.exa_skel_nedges.restype = ctypes.c_int64
    lib.exa_skel_nedges.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.exa_skel_copy.restype = None
    lib.exa_skel_copy.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, f64p, f64p, i64p,
    ]
    lib.exa_skel_free.restype = None
    lib.exa_skel_free.argtypes = [ctypes.c_void_p]
    lib._exa_skel_bound = True
    return lib


def skeletonize(
    segmentation,
    scale=1.25,
    const=450,
    pdrf_exponent=4,
    pdrf_scale=100000,
    soma_detection_threshold=1000,
    soma_acceptance_threshold=3500,
    soma_invalidation_scale=1.0,
    soma_invalidation_const=300,
    anisotropy=(1.0, 1.0, 1.0),
    fix_borders=True,
    fill_holes=True,
    max_paths=None,
    parallel=1,
    slab_planes=64,
):
    """TEASAR-skeletonize every labeled segment.

    Parameter names/defaults mirror the kimimaro call at reference
    inference.py:272-291 (including ``parallel``: worker threads over
    connected components; results are deterministic for any count).
    Returns ``{segment_id: Skeleton}``; a segment with multiple
    connected components contributes one merged Skeleton (vertices
    concatenated), like kimimaro.
    """
    del max_paths  # accepted for parity; the trace loop runs to coverage
    # Lazy chunked handles (io.LazyArray subclasses) stream through the
    # crop engine; anything array-like (numpy/jax/list/tuple/sequence)
    # densifies -- only handles WITHOUT dense conversion but WITH chunk
    # reads take the lazy path.
    if not isinstance(
        segmentation, (np.ndarray, list, tuple)
    ) and not hasattr(segmentation, "__array__"):
        return skeletonize_lazy(
            segmentation, scale=scale, const=const,
            pdrf_exponent=pdrf_exponent, pdrf_scale=pdrf_scale,
            soma_detection_threshold=soma_detection_threshold,
            soma_acceptance_threshold=soma_acceptance_threshold,
            soma_invalidation_scale=soma_invalidation_scale,
            soma_invalidation_const=soma_invalidation_const,
            anisotropy=anisotropy, fix_borders=fix_borders,
            fill_holes=fill_holes, parallel=parallel,
            slab_planes=slab_planes,
        )
    seg = np.ascontiguousarray(segmentation, dtype=np.uint32)
    if seg.ndim != 3:
        raise ValueError(f"expected 3D segmentation, got {seg.shape}")
    lib = _bind(build.load())
    params = _params_array(
        scale, const, pdrf_exponent, pdrf_scale,
        soma_detection_threshold, soma_acceptance_threshold,
        soma_invalidation_scale, soma_invalidation_const, anisotropy,
        parallel,
        # kimimaro black_border semantics: volume faces count as
        # background only for single-label volumes.
        black_border=(seg.min() == seg.max()),
    )
    handle = lib.exa_skeletonize(
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        *seg.shape,
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        1 if fix_borders else 0,
        1 if fill_holes else 0,
    )
    pieces = _collect_pieces(lib, handle)
    return _merge_pieces(pieces)


def _params_array(scale, const, pdrf_exponent, pdrf_scale,
                  soma_detection_threshold, soma_acceptance_threshold,
                  soma_invalidation_scale, soma_invalidation_const,
                  anisotropy, parallel, black_border):
    return np.asarray(
        [
            scale, const, pdrf_exponent, pdrf_scale,
            soma_detection_threshold, soma_acceptance_threshold,
            soma_invalidation_scale, soma_invalidation_const,
            anisotropy[0], anisotropy[1], anisotropy[2],
            max(int(parallel), 1),
            1.0 if black_border else 0.0,
        ],
        dtype=np.float64,
    )


def _collect_pieces(lib, handle, pieces=None):
    if not handle:
        raise RuntimeError("skeletonization failed")
    if pieces is None:
        pieces = {}
    try:
        for i in range(lib.exa_skel_count(handle)):
            label = int(lib.exa_skel_label(handle, i))
            nv = lib.exa_skel_nverts(handle, i)
            ne = lib.exa_skel_nedges(handle, i)
            verts = np.empty((nv, 3), np.float64)
            radii = np.empty(nv, np.float64)
            edges = np.empty((ne, 2), np.int64)
            lib.exa_skel_copy(
                handle, i,
                verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                radii.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            pieces.setdefault(label, []).append((verts, radii, edges))
    finally:
        lib.exa_skel_free(handle)
    return pieces


def _merge_pieces(pieces):
    skeletons = {}
    for label, parts in pieces.items():
        offset = 0
        verts, radii, edges = [], [], []
        for v, r, e in parts:
            verts.append(v)
            radii.append(r)
            edges.append(e + offset)
            offset += len(r)
        skeletons[label] = Skeleton(
            id=label,
            vertices=np.concatenate(verts),
            radii=np.concatenate(radii),
            edges=np.concatenate(edges),
        )
    return skeletons


def skeletonize_lazy(
    labels,
    scale=1.25,
    const=450,
    pdrf_exponent=4,
    pdrf_scale=100000,
    soma_detection_threshold=1000,
    soma_acceptance_threshold=3500,
    soma_invalidation_scale=1.0,
    soma_invalidation_const=300,
    anisotropy=(1.0, 1.0, 1.0),
    fix_borders=True,
    fill_holes=True,
    parallel=1,
    slab_planes=64,
):
    """TEASAR-skeletonize a lazy (zarr/N5) label handle beyond RAM.

    Two streaming passes over the (D, H, W) uint32 store: a Z-slab
    discovery pass collects per-label bounding boxes (native
    ``exa_label_bboxes``), then each label's 1-voxel-padded bbox crop
    is read back and skeletonized in isolation
    (``exa_skeletonize_crop``). The pad guarantees a label only touches
    crop faces where it touches true volume faces, so EDT, fix_borders,
    black_border, and fill_holes semantics -- and therefore the output
    -- are bit-identical to the dense engine (tests/test_skeleton.py
    TestSkeletonizeLazy). Peak host RAM is one slab plus the largest
    single label's bbox crop, never the full volume.
    """
    if labels.ndim != 3:
        raise ValueError(f"expected 3D label handle, got {labels.shape}")
    bbox, counts, gmin, gmax = bbox_scan(
        labels, 0, labels.shape[0], slab_planes
    )
    params = _params_array(
        scale, const, pdrf_exponent, pdrf_scale,
        soma_detection_threshold, soma_acceptance_threshold,
        soma_invalidation_scale, soma_invalidation_const, anisotropy,
        parallel, black_border=(gmin == gmax),
    )
    labs = [lab for lab in range(1, len(counts)) if counts[lab]]
    return _merge_pieces(
        crop_pass(labels, labs, bbox, params, fix_borders, fill_holes)
    )


def bbox_scan(labels, z_lo, z_hi, slab_planes=64):
    """Slab-streamed per-label bbox discovery over planes [z_lo, z_hi).

    Returns ``(bbox, counts, gmin, gmax)``: ``bbox`` is
    ``(n_labels + 1, 6)`` int64 with mins in columns 0/2/4
    (INT64_MAX when unseen) and maxs in columns 1/3/5 (-1 unseen),
    ``counts`` the per-label voxel counts -- the partial-scan building
    block of :func:`skeletonize_lazy` and the multi-process
    :func:`..distributed.skeletonize_sharded` (partials from disjoint
    Z ranges merge by elementwise min/max + count sum).
    """
    d, h, w = labels.shape
    lib = _bind(build.load())
    i64p = ctypes.POINTER(ctypes.c_int64)
    n_labels = 0
    bbox = np.empty((1, 6), np.int64)
    bbox[:, 0::2] = np.iinfo(np.int64).max
    bbox[:, 1::2] = -1
    counts = np.zeros(1, np.int64)
    gmin, gmax = None, None
    for lo in range(z_lo, z_hi, slab_planes):
        hi = min(lo + slab_planes, z_hi)
        slab = np.ascontiguousarray(labels[lo:hi], dtype=np.uint32)
        smax = int(slab.max())
        gmin = int(slab.min()) if gmin is None else min(gmin, int(slab.min()))
        gmax = smax if gmax is None else max(gmax, smax)
        if smax > n_labels:
            grow = np.empty((smax - n_labels, 6), np.int64)
            grow[:, 0::2] = np.iinfo(np.int64).max
            grow[:, 1::2] = -1
            bbox = np.concatenate([bbox, grow])
            counts = np.concatenate(
                [counts, np.zeros(smax - n_labels, np.int64)]
            )
            n_labels = smax
        rc = lib.exa_label_bboxes(
            slab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            hi - lo, h, w, lo, n_labels,
            bbox.ctypes.data_as(i64p), counts.ctypes.data_as(i64p),
        )
        if rc < 0:
            raise RuntimeError("label bbox scan failed")
    return bbox, counts, gmin, gmax


def crop_pass(labels, labs, bbox, params, fix_borders, fill_holes):
    """Skeletonize each label in ``labs`` from its 1-voxel-padded bbox
    crop of the (lazy) label store; returns the raw pieces dict (label
    -> [(verts, radii, edges), ...]) for :func:`_merge_pieces`.

    The pad guarantees a label only touches crop faces where it touches
    true volume faces, so the output is bit-identical to the dense
    engine -- and independent of which process runs which label, which
    is what lets ``skeletonize_sharded`` partition ``labs``.
    """
    d, h, w = labels.shape
    lib = _bind(build.load())
    pieces = {}
    for lab in labs:
        z0, z1, y0, y1, x0, x1 = bbox[lab]
        z0, y0, x0 = max(z0 - 1, 0), max(y0 - 1, 0), max(x0 - 1, 0)
        z1, y1, x1 = min(z1 + 2, d), min(y1 + 2, h), min(x1 + 2, w)
        crop = np.ascontiguousarray(
            labels[z0:z1, y0:y1, x0:x1], dtype=np.uint32
        )
        handle = lib.exa_skeletonize_crop(
            crop.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            z1 - z0, y1 - y0, x1 - x0, z0, y0, x0, d, h, w,
            lab,
            params.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            1 if fix_borders else 0,
            1 if fill_holes else 0,
        )
        _collect_pieces(lib, handle, pieces)
    return pieces
