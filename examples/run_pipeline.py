"""End-to-end example: volume -> affinities -> segmentation -> SWC zip.

Runs on synthetic data so it works anywhere (CPU or TPU); swap in
``img_util.read("gs://.../brain.zarr")`` and a trained ``.pth`` for real
use. Mirrors the reference README workflows.

Usage::

    python examples/run_pipeline.py [output_dir]
"""

import os
import sys

import numpy as np

# runnable from anywhere without an install, like the other examples
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from aind_exaspim_neuron_segmentation_tpu import inference  # noqa: E402
from aind_exaspim_neuron_segmentation_tpu.utils import img_util
from aind_exaspim_neuron_segmentation_tpu.utils.profiling import StageTimer


def synthetic_brain(shape=(128, 128, 128), seed=0):
    rng = np.random.default_rng(seed)
    lab = np.zeros(shape, np.uint32)
    lab[16:112, 20:52, 16:112] = 1
    lab[16:112, 76:108, 16:112] = 2
    img = rng.uniform(0, 120, shape).astype(np.float32)
    img[lab > 0] += rng.uniform(600, 1400, int((lab > 0).sum()))
    return img, lab


def main(out_dir="./pipeline_out"):
    os.makedirs(out_dir, exist_ok=True)
    timer = StageTimer()

    img, lab = synthetic_brain()

    with timer.stage("load_model"):
        # No checkpoint: random weights demonstrate the flow; pass a
        # trained UNet3d-*.pth path for real affinities.
        model = inference.load_model(affinity_mode=True)

    with timer.stage("predict"):
        affinities = inference.predict(img, model, verbose=True)

    # With random weights the net's affinities are meaningless; use the
    # ground-truth-derived affinities downstream so the demo output is
    # interpretable. With a trained checkpoint, feed `affinities`.
    oracle = img_util.get_affinity_channels(lab).astype(np.float32)

    with timer.stage("segment"):
        seg = inference.affinities_to_segmentation(oracle)

    with timer.stage("skeletonize+zip"):
        zip_path = os.path.join(out_dir, "neurons.zip")
        inference.segmentation_to_zipped_swcs(seg, zip_path)

    with timer.stage("visualize"):
        img_util.plot_mips(
            affinities[0], os.path.join(out_dir, "affinity_mips.png")
        )
        img_util.plot_segmentation_mips(
            seg, os.path.join(out_dir, "segmentation_mips.png")
        )

    print(timer.summary())
    print(f"\noutputs in {out_dir}: neurons.zip + MIP PNGs")


if __name__ == "__main__":
    main(*sys.argv[1:2])
