"""Sharded order statistics: exact percentiles without a global sort.

The reference normalizes with a full-volume ``np.percentile``
(reference img_util.py:526), which requires the volume dense in host
RAM. The TPU-native replacement computes the same linearly-interpolated
percentile over a (possibly mesh-sharded) array by **radix select**:

float32 values map monotonically onto uint32 keys (sign-magnitude
flip), and the k-th order statistic is located by three rounds of
histogramming the key space (12 + 12 + 8 bits). Each round needs one
O(N) streaming pass plus a 4096-entry ``psum`` across the mesh -- no
global sort, no gather, exact to the bit.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Radix plan: shifts and bin counts per round (total 32 bits).
_PLAN = ((20, 1 << 12), (8, 1 << 12), (0, 1 << 8))


def _float_keys(x):
    """Monotone uint32 keys: a <= b  <=>  key(a) <= key(b)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    sign = (u >> 31).astype(jnp.bool_)
    return jnp.where(sign, ~u, u | jnp.uint32(0x80000000))


def _keys_to_float(key):
    sign = (key >> 31).astype(jnp.bool_)
    u = jnp.where(sign, key & jnp.uint32(0x7FFFFFFF), ~key)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _bits(n):
    return int(n).bit_length() - 1


def _order_stat_key(keys, k, psum_fn):
    """uint32 key of the k-th (0-based) smallest element."""
    # Counts ride int32 by default (fastest on TPU); with x64 enabled
    # they widen to int64 so ranks/buckets beyond 2^31-1 are exact --
    # the escape hatch rank_plan's overflow guard advertises.
    count_dt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    prefix = jnp.uint32(0)
    remaining = jnp.asarray(k, count_dt)

    for shift, bins in _PLAN:
        fixed_bits = 32 - (shift + _bits(bins))  # high bits already fixed
        if fixed_bits > 0:
            fixed_mask = np.uint32(
                (0xFFFFFFFF >> (32 - fixed_bits)) << (32 - fixed_bits)
            )
            in_prefix = (keys & fixed_mask) == (prefix & fixed_mask)
        else:
            in_prefix = jnp.ones(keys.shape, jnp.bool_)
        idx = ((keys >> jnp.uint32(shift)) & jnp.uint32(bins - 1)).astype(
            jnp.int32
        )
        contrib = jnp.where(in_prefix, idx, bins)  # out-of-range bucket
        hist = jnp.zeros(bins + 1, count_dt).at[contrib.ravel()].add(1)
        hist = psum_fn(hist)[:bins]
        below = jnp.cumsum(hist) - hist
        in_bin = (below <= remaining) & (below + hist > remaining)
        b = jnp.argmax(in_bin)
        prefix = prefix | (b.astype(jnp.uint32) << jnp.uint32(shift))
        remaining = remaining - below[b]
    return prefix


def order_stat(x, k, psum_fn=lambda v: v):
    """Exact k-th smallest float32 value (0-based), optionally sharded."""
    keys = _float_keys(x)
    key = _order_stat_key(keys, k, psum_fn)
    return _keys_to_float(key)


def rank_plan(n_total, qs):
    """np.percentile's linear-interpolation rank plan + overflow guard.

    The single source of truth for every radix-select percentile
    caller (``_percentiles`` here, ``predict_sharded``'s on-device
    normalization): returns ``(ks, plan)`` where ``ks`` are the
    0-based order-stat ranks to fetch and ``plan`` holds one
    ``(idx_lo, idx_hi, frac)`` triple per q indexing into ``ks``
    (``idx_hi is None`` when the rank is integral).

    Ranks and histogram counts ride device int32 unless x64 is
    enabled (then int64 -- see ``_order_stat_key``); beyond 2^31-1
    elements the int32 arithmetic would silently wrap, so refuse.
    """
    if n_total > np.iinfo(np.int32).max and not jax.config.jax_enable_x64:
        raise ValueError(
            f"{n_total} elements overflow int32 rank arithmetic; enable "
            "jax_enable_x64 or compute percentiles per sub-volume"
        )
    ks, plan = [], []
    for q in qs:
        rank = (n_total - 1) * (float(q) / 100.0)
        k_lo = int(np.floor(rank))
        frac = rank - k_lo
        idx_lo = len(ks)
        ks.append(k_lo)
        idx_hi = None
        if frac > 0:
            idx_hi = len(ks)
            ks.append(k_lo + 1)
        plan.append((idx_lo, idx_hi, frac))
    return ks, plan


def _percentiles(x, qs, n_total, psum_fn):
    ks, plan = rank_plan(n_total, qs)
    keys = _float_keys(x)
    vals = [
        _keys_to_float(_order_stat_key(keys, k, psum_fn)) for k in ks
    ]
    outs = []
    for idx_lo, idx_hi, frac in plan:
        v_lo = vals[idx_lo]
        if idx_hi is not None:
            outs.append(v_lo + (vals[idx_hi] - v_lo) * np.float32(frac))
        else:
            outs.append(v_lo)
    return jnp.stack(outs)


def percentile_sharded(x_local, qs, n_total, axis_name):
    """Exact percentiles of a mesh-sharded array (inside shard_map)."""
    return _percentiles(
        x_local, qs, n_total, lambda v: jax.lax.psum(v, axis_name)
    )


def order_stats_sharded(x_local, ks, axis_names):
    """Exact k-th smallest values of a mesh-sharded array (shard_map).

    ``ks``: static 0-based ranks. Elements a shard should NOT count
    (padding, halo duplicates) must be set to +inf by the caller; as
    long as every rank in ``ks`` is below the global count of finite
    elements, the +inf sentinels never win a radix round. Returns a
    stacked float32 vector. Host-side linear interpolation of adjacent
    order stats (in float64) reproduces np.percentile bit-for-bit for
    float32 data -- how ``parallel.predict_sharded`` normalizes without
    densifying its input.
    """
    psum = lambda v: jax.lax.psum(v, axis_names)  # noqa: E731
    keys = _float_keys(x_local)
    return jnp.stack(
        [_keys_to_float(_order_stat_key(keys, int(k), psum)) for k in ks]
    )


@functools.partial(jax.jit, static_argnames=("qs",))
def percentile_device(x, qs):
    """Single-device percentile matching np.percentile (linear interp)."""
    return _percentiles(x, qs, x.size, lambda v: v)
