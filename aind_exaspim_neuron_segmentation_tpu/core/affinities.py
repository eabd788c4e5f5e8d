"""Affinity-channel generation from instance label masks.

Semantics (verified numerically against reference utils/img_util.py:159-253):
for edge direction ``e`` (one of the unit offsets), the affinity at voxel
``v`` is 1 iff ``label[v] == label[v + e] != 0``; the channel is zero-padded
at the *end* of the edge axis so it keeps the label shape. Output is a
``(3, Z, Y, X)`` float array.

The JAX implementation is a single fused shift-compare-pad expression per
channel -- trivially XLA-fusable, used on-device when computing training
targets inside the jitted train step.
"""

import jax.numpy as jnp
import numpy as np

DEFAULT_EDGES = ((1, 0, 0), (0, 1, 0), (0, 0, 1))


def get_affinity_mask(label_mask, edge):
    """Binary affinity mask for one unit edge direction (host/numpy).

    Reference: utils/img_util.py:188-253.
    """
    axis = tuple(edge).index(1)
    ahead = [slice(None)] * 3
    behind = [slice(None)] * 3
    ahead[axis] = slice(1, None)
    behind[axis] = slice(None, -1)
    o1 = label_mask[tuple(ahead)]
    o2 = label_mask[tuple(behind)]
    aff = ((o1 == o2) & (o1 != 0)).astype(label_mask.dtype)
    pad = [(0, 0)] * 3
    pad[axis] = (0, 1)
    return np.pad(aff, pad, mode="constant", constant_values=0)


def get_affinity_channels(label_mask, edges=DEFAULT_EDGES):
    """(3, Z, Y, X) float affinity channels (host/numpy).

    Reference: utils/img_util.py:159-185 (float64 output via np.zeros).
    """
    out = np.zeros((len(edges),) + label_mask.shape)
    for i, edge in enumerate(edges):
        out[i] = get_affinity_mask(label_mask, edge)
    return out


def affinity_channels_jax(label_mask, edges=DEFAULT_EDGES, dtype=jnp.float32):
    """(3, Z, Y, X) affinity channels on device (jit-safe).

    Numerically identical to :func:`get_affinity_channels` (up to dtype).
    """
    channels = []
    for edge in edges:
        axis = tuple(edge).index(1)
        ahead = [slice(None)] * 3
        behind = [slice(None)] * 3
        ahead[axis] = slice(1, None)
        behind[axis] = slice(None, -1)
        o1 = label_mask[tuple(ahead)]
        o2 = label_mask[tuple(behind)]
        aff = ((o1 == o2) & (o1 != 0)).astype(dtype)
        pad = [(0, 0)] * 3
        pad[axis] = (0, 1)
        channels.append(jnp.pad(aff, pad))
    return jnp.stack(channels)
