"""On-device affinity pre-digest for the native postprocess engines.

The TPU computes the stitched affinity volume; the host watershed's
pass 1a (``native/src/agglomerate.cpp`` ``exa_watershed``) then re-reads
~7 float32 values per voxel just to reduce them to one decision byte,
and the RAG build re-reads 12 bytes/voxel of floats only to quantize
them to 256 bins (reference pipeline: inference.py:196-237 densifies
float affinities for waterz). This module emits both digests on device,
while the affinities are still resident:

* ``plan`` uint8 (D, H, W): bits 0-2 flag outgoing ``aff >= high``
  edges along z/y/x; bits 3-5 encode the steepest ``>= low`` incident
  neighbor (0 = background, 1..6 = +z,+y,+x,-z,-y,-x) -- bit-identical
  to pass 1a's byte (same f32 compares, same enumeration order
  out-z, in-z, out-y, in-y, out-x, in-x with strict ``>``).
* ``qaff`` uint8 (3, D, H, W): ``int(aff * 256)`` clipped to [0, 255]
  -- exactly ``Edge::quantize``, lossless for the 256-bin RAG
  histograms (f32 multiply by 256 is exact; sigmoid outputs are
  non-negative so C truncation equals floor).

Host then transfers 4 bytes/voxel instead of 12 and replays pure
integer work (``exa_agglomerate_pre``). The float thresholds low/high
are compared HERE in f32 -- u8 bins cannot represent the default
high = 0.9999.

Slab streaming: ``predict`` produces the volume in Z slabs. A voxel in
the first slab plane needs the previous slab's last z-affinity plane
for its incoming -z candidate; callers thread that single plane
through ``prev_plane``.
"""

import functools

import jax
import jax.numpy as jnp


def _digest_core(aff, in_z, in_y, in_x, valids, low, high):
    """Shared digest core: steepest >= low candidate + >= high flags +
    u8 quantization.

    The SINGLE implementation of the parity-critical semantics both
    entry points claim bit-identity to (agglomerate.cpp pass 1a +
    Edge::quantize): candidate enumeration order out-z, in-z, out-y,
    in-y, out-x, in-x with strict ``>``, f32 compares against low/high,
    and ``clip(aff * 256, 0, 255)``. ``valids`` is the 6-tuple of
    boolean masks in that order (broadcastable to the voxel grid).
    """
    az, ay, ax = aff[0], aff[1], aff[2]
    out_z_v, in_z_v, out_y_v, in_y_v, out_x_v, in_x_v = valids
    low = jnp.float32(low)
    high = jnp.float32(high)
    best = jnp.full(az.shape, jnp.float32(-1.0))
    dirs = jnp.zeros(az.shape, jnp.uint8)
    candidates = (
        (az, out_z_v, 1), (in_z, in_z_v, 4),
        (ay, out_y_v, 2), (in_y, in_y_v, 5),
        (ax, out_x_v, 3), (in_x, in_x_v, 6),
    )
    for a, valid, code in candidates:
        upd = valid & (a >= low) & (a > best)
        best = jnp.where(upd, a, best)
        dirs = jnp.where(upd, jnp.uint8(code), dirs)

    flags = (
        jnp.where(out_z_v & (az >= high), jnp.uint8(1), jnp.uint8(0))
        | jnp.where(out_y_v & (ay >= high), jnp.uint8(2), jnp.uint8(0))
        | jnp.where(out_x_v & (ax >= high), jnp.uint8(4), jnp.uint8(0))
    )
    plan = flags | (dirs << 3)
    qaff = jnp.clip(aff * 256.0, 0.0, 255.0).astype(jnp.uint8)
    return plan, qaff


@functools.partial(
    jax.jit, static_argnames=("first_slab", "last_slab")
)
def predigest_slab(aff, prev_plane=None, *, first_slab=True,
                   last_slab=True, low=0.1, high=0.9999):
    """Digest one Z slab of affinities into (plan, qaff) uint8 arrays.

    ``aff``: float32 (3, d, H, W) -- the slab's final (blended)
    affinities. ``prev_plane``: float32 (H, W), the z-affinity plane at
    the slab's preceding global z (ignored when ``first_slab``).
    ``first_slab`` / ``last_slab``: whether the slab starts at global
    z=0 / ends at global z=D-1 (controls edge validity at the slab's
    z faces).
    """
    aff = aff.astype(jnp.float32)
    _, d, h, w = aff.shape
    az, ay, ax = aff[0], aff[1], aff[2]
    if prev_plane is None:
        prev_plane = jnp.zeros((h, w), jnp.float32)

    # Candidate affinity value + validity per direction. Outgoing edge
    # along c is stored AT the voxel; incoming is the neighbor's stored
    # value shifted forward. Incoming -z at slab plane 0 comes from
    # prev_plane.
    iota_z = jnp.arange(d)[:, None, None]
    iota_y = jnp.arange(h)[None, :, None]
    iota_x = jnp.arange(w)[None, None, :]
    full = jnp.ones((d, h, w), bool)
    in_z = jnp.concatenate([prev_plane[None], az[:-1]], axis=0)
    in_y = jnp.concatenate(
        [jnp.zeros((d, 1, w), jnp.float32), ay[:, :-1]], axis=1
    )
    in_x = jnp.concatenate(
        [jnp.zeros((d, h, 1), jnp.float32), ax[:, :, :-1]], axis=2
    )
    valids = (
        full if not last_slab else iota_z + 1 < d,
        full if not first_slab else iota_z > 0,
        iota_y + 1 < h,
        iota_y > 0,
        iota_x + 1 < w,
        iota_x > 0,
    )
    return _digest_core(aff, in_z, in_y, in_x, valids, low, high)


def predigest_shard(aff, prev_z, prev_y, z_off, y_off, dims,
                    low=0.1, high=0.9999):
    """Digest one device's final blended shard inside ``shard_map``.

    The multi-chip variant of :func:`predigest_slab` for
    ``parallel.predict_sharded(predigest=True)``: each device digests
    its own (Z x Y)-sharded region of the blended affinity volume, so
    only 4 bytes/voxel of u8 digests ever leave the device (vs 12 of
    f32). Edge validity is masked by GLOBAL coordinates and the two
    incoming-edge halos arrive via single-plane ``ppermute``:

    ``aff``: f32 (3, kz, ky, wp) -- the shard's final blended values
    (own + kept spill extents). ``prev_z``: f32 (ky, wp), the Z
    predecessor's z-affinity plane at global ``z_off - 1`` (zeros for
    the first shard -- which equals the volume's zero trim margin).
    ``prev_y``: f32 (kz, wp), same for the Y predecessor at global
    ``y_off - 1``. ``z_off`` / ``y_off``: traced global offsets of the
    shard's first plane. ``dims``: static global (D, H, W).

    Same candidate enumeration, f32 compares, and u8 quantization as
    :func:`predigest_slab`, so digesting the assembled float output
    host-side gives bit-identical bytes (tests/test_parallel.py).
    """
    aff = aff.astype(jnp.float32)
    _, kz, ky, wp = aff.shape
    d_g, h_g, w_g = dims
    az, ay, ax = aff[0], aff[1], aff[2]

    z_g = z_off + jnp.arange(kz)[:, None, None]
    y_g = y_off + jnp.arange(ky)[None, :, None]
    x_g = jnp.arange(wp)[None, None, :]

    in_z = jnp.concatenate([prev_z[None], az[:-1]], axis=0)
    in_y = jnp.concatenate([prev_y[:, None], ay[:, :-1]], axis=1)
    in_x = jnp.concatenate(
        [jnp.zeros((kz, ky, 1), jnp.float32), ax[:, :, :-1]], axis=2
    )
    valids = (
        z_g + 1 < d_g, z_g > 0,
        y_g + 1 < h_g, y_g > 0,
        x_g + 1 < w_g, x_g > 0,
    )
    return _digest_core(aff, in_z, in_y, in_x, valids, low, high)


def predigest(aff, low=0.1, high=0.9999):
    """Digest a whole in-memory affinity volume; returns numpy arrays.

    ``aff``: float32 (3, D, H, W), host or device. Single-slab call of
    :func:`predigest_slab` (first and last).
    """
    import numpy as np

    plan, qaff = predigest_slab(
        jnp.asarray(aff), first_slab=True, last_slab=True,
        low=low, high=high,
    )
    return np.asarray(plan), np.asarray(qaff)


def predigest_streaming(aff, low=0.1, high=0.9999, slab_planes=None):
    """Digest a lazy (zarr/N5) affinity handle in Z slabs.

    ``aff``: any chunked reader of shape (3, D, H, W) -- the float
    volume is never dense on host or device; each slab (f32, device)
    plus the 4-bytes/voxel digest accumulators bound host RAM. The
    previous slab's last z-affinity plane is threaded through for the
    -z steepest candidate, so the result is bit-identical to
    :func:`predigest` of the dense volume (tests/test_predigest.py).

    ``slab_planes``: Z planes per slab; default sizes the device slab
    to ~512 MB of f32.
    """
    import numpy as np

    if aff.ndim != 4 or aff.shape[0] != 3:
        raise ValueError(f"expected (3, D, H, W) handle, got {aff.shape}")
    _, d, h, w = aff.shape
    if slab_planes is None:
        budget = 512 * 1024**2
        slab_planes = max(int(budget // (3 * h * w * 4)), 1)
    plan = np.empty((d, h, w), np.uint8)
    qaff = np.empty((3, d, h, w), np.uint8)
    prev = None
    for lo in range(0, d, slab_planes):
        hi = min(lo + slab_planes, d)
        block = jnp.asarray(
            np.asarray(aff[:, lo:hi], dtype=np.float32)
        )
        p, q = predigest_slab(
            block, prev, first_slab=(lo == 0), last_slab=(hi == d),
            low=low, high=high,
        )
        prev = block[0, -1]
        plan[lo:hi] = np.asarray(p)
        qaff[:, lo:hi] = np.asarray(q)
    return plan, qaff
