"""Image utilities: IO dispatch, normalization, affinities, patches, viz.

One-stop surface mirroring reference utils/img_util.py -- thin
re-exports over the dedicated subsystems plus the matplotlib MIP
visualizations and the AIND block-path discovery helper.
"""

import numpy as np

from aind_exaspim_neuron_segmentation_tpu.core.affinities import (  # noqa: F401
    get_affinity_channels,
    get_affinity_mask,
    get_offset_masks,
)
from aind_exaspim_neuron_segmentation_tpu.core.normalize import (  # noqa: F401
    normalize,
)
from aind_exaspim_neuron_segmentation_tpu.core.patches import (  # noqa: F401
    add_padding,
    get_patch,
    get_patch_slices,
    get_slices,
    is_contained,
)
from aind_exaspim_neuron_segmentation_tpu.io import read  # noqa: F401
from aind_exaspim_neuron_segmentation_tpu.utils import util

AIND_BUCKET = "allen-nd-goog"


def remove_small_segments(label_mask, min_size):
    """Drop segments with <= min_size voxels (reference img_util.py:536-559)."""
    from aind_exaspim_neuron_segmentation_tpu import postprocess

    return postprocess.remove_small_segments(label_mask, min_size)


# --- Visualization (reference img_util.py:257-358) ---


def make_segmentation_colormap(mask, seed=42):
    """ListedColormap: black background + reproducible random colors."""
    from matplotlib.colors import ListedColormap

    n_labels = int(mask.max()) + 1
    rng = np.random.default_rng(seed)
    colors = [(0, 0, 0)]
    colors += list(rng.uniform(0.2, 1.0, size=(max(n_labels - 1, 0), 3)))
    return ListedColormap(colors)


def _mips(img, axs, render, show):
    import matplotlib.pyplot as plt

    names = ["XY", "XZ", "YZ"]
    vol = img[0, 0] if img.ndim == 5 else img
    for i in range(3):
        render(axs[i], np.max(vol, axis=i))
        axs[i].set_title(names[i], fontsize=16)
        axs[i].set_xticks([])
        axs[i].set_yticks([])
    plt.tight_layout()
    del show


def plot_mips(img, output_path=None, vmax=None, show=False):
    """Maximum-intensity projections along the three axes."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    vmax = vmax or np.percentile(img, 99.9)
    fig, axs = plt.subplots(1, 3, figsize=(10, 4))
    _mips(img, axs, lambda ax, mip: ax.imshow(mip, vmax=vmax), show)
    if output_path:
        plt.savefig(output_path, dpi=200)
    if show:
        plt.show()
    plt.close(fig)


def plot_segmentation_mips(segmentation, output_path=None, show=False):
    """Label-colored MIPs of a segmentation."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    cmap = make_segmentation_colormap(segmentation)
    fig, axs = plt.subplots(1, 3, figsize=(10, 4))
    _mips(
        segmentation, axs,
        lambda ax, mip: ax.imshow(mip, cmap=cmap, interpolation="none"),
        show,
    )
    if output_path:
        plt.savefig(output_path, dpi=200)
    if show:
        plt.show()
    plt.close(fig)


def list_block_paths(prefix, bucket=AIND_BUCKET, client=None):
    """(img_paths, label_paths) for AIND GCS blocks.

    Pairs ``input.*`` and ``Fill_Label_Mask.*`` per block directory
    (reference img_util.py:477-501).
    """
    img_paths, label_paths = [], []
    for block in util.list_gcs_subprefixes(bucket, prefix, client=client):
        img = util.find_subprefix_with_keyword(
            bucket, block, "input.", client=client
        )
        lab = util.find_subprefix_with_keyword(
            bucket, block, "Fill_Label_Mask.", client=client
        )
        img_paths.append(f"gs://{bucket}/{img}")
        label_paths.append(f"gs://{bucket}/{lab}")
    return img_paths, label_paths
