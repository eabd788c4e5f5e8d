"""Affinity -> segmentation -> skeleton postprocessing.

Python surface over the in-tree native engine, matching the reference's
external-dependency call sites:

* :func:`agglomerate` -- waterz.agglomerate generator parity
  (reference inference.py:224-233);
* :func:`remove_small_segments` -- utils/img_util.py:536-559 parity over
  our fastremap-equivalent unique/mask_except/renumber;
* :func:`skeletonize` -- kimimaro.skeletonize parity
  (reference inference.py:272-291).
"""

import numpy as np

from aind_exaspim_neuron_segmentation_tpu import native
from aind_exaspim_neuron_segmentation_tpu.native import (  # noqa: F401
    mask_except,
    renumber,
    unique,
    watershed,
)


def agglomerate(affinities, thresholds, aff_threshold_low=0.1,
                aff_threshold_high=0.9999, quantile_pct=85):
    """Generator of one uint32 segmentation per threshold (ascending).

    Mirrors ``waterz.agglomerate``: seeded watershed fragments, then
    hierarchical agglomeration with score = 1 - quantile(affinity)
    (85th percentile default), snapshotting at each requested threshold.
    """
    segs = native.agglomerate_all(
        affinities, thresholds,
        aff_threshold_low=aff_threshold_low,
        aff_threshold_high=aff_threshold_high,
        quantile_pct=quantile_pct,
    )
    for i in range(segs.shape[0]):
        yield segs[i]


def remove_small_segments(label_mask, min_size):
    """Drop segments with <= min_size voxels, renumber contiguously.

    Reference: utils/img_util.py:536-559 (strictly-greater keep rule).
    """
    ids, counts = unique(label_mask, return_counts=True)
    keep = [i for i, c in zip(ids, counts) if c > min_size and i != 0]
    masked = mask_except(label_mask, np.asarray(keep, np.uint32))
    out, _ = renumber(masked, preserve_zero=True, in_place=True)
    return out


def skeletonize(segmentation, **teasar_params):
    """TEASAR skeletonization -- implemented in postprocess.skeleton."""
    from aind_exaspim_neuron_segmentation_tpu.postprocess.skeleton import (
        skeletonize as _skeletonize,
    )

    return _skeletonize(segmentation, **teasar_params)


def segment_streaming(affinities, **kwargs):
    """Beyond-RAM lazy-zarr segmentation -- postprocess.streaming."""
    from aind_exaspim_neuron_segmentation_tpu.postprocess.streaming import (
        segment_streaming as _segment_streaming,
    )

    return _segment_streaming(affinities, **kwargs)


def segment_streaming_sharded(affinities, **kwargs):
    """Multi-process streaming segmentation over ``jax.distributed``
    (bit-identical to :func:`segment_streaming`) --
    postprocess.distributed."""
    from aind_exaspim_neuron_segmentation_tpu.postprocess.distributed import (
        segment_streaming_sharded as _sharded,
    )

    return _sharded(affinities, **kwargs)


def skeletonize_sharded(labels, **kwargs):
    """Multi-process TEASAR skeletonization over ``jax.distributed``
    (bit-identical to :func:`skeletonize` on a lazy label store) --
    postprocess.distributed."""
    from aind_exaspim_neuron_segmentation_tpu.postprocess.distributed import (
        skeletonize_sharded as _sharded,
    )

    return _sharded(labels, **kwargs)
