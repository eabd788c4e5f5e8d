"""Pure, device-free numerics shared by the inference and training stacks.

Everything in here is small, deterministic, and golden-testable without a
TPU: patch-grid arithmetic, padding/slicing, percentile normalization, and
affinity-channel generation.
"""

from aind_exaspim_neuron_segmentation_tpu.core.patches import (  # noqa: F401
    add_padding,
    blend_weight_map,
    patch_starts_array,
    count_patches,
    generate_patch_starts,
    get_patch,
    get_patch_slices,
    get_slices,
    is_contained,
    patch_grid_ranges,
)
from aind_exaspim_neuron_segmentation_tpu.core.normalize import (  # noqa: F401
    clip_brightness,
    normalize,
)
from aind_exaspim_neuron_segmentation_tpu.core.affinities import (  # noqa: F401
    DEFAULT_EDGES,
    get_affinity_channels,
    get_affinity_mask,
    get_offset_masks,
    affinity_channels_jax,
)
