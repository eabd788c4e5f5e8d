"""Beyond-RAM pipeline example: zarr image -> zarr affinities ->
zarr segmentation -> SWC zip, with NO volume ever dense in host memory.

Every stage streams Z slabs:

1. ``inference.predict(lazy_image, out_path=...)`` reads the image
   slab-by-slab (exact streaming percentile normalization) and appends
   blended affinities into a Zarr store;
2. ``inference.affinities_to_segmentation(lazy_affinities,
   out_path=...)`` runs the slab-streaming native engine
   (``streamseg.cpp``): device pre-digest, per-slab watershed with
   cross-slab stitching, streamed RAG build, merge loop, and a final
   relabel straight into a Zarr label store -- peak host RAM is
   O(RAG + slab);
3. ``inference.segmentation_to_zipped_swcs(lazy_labels, ...)``
   TEASAR-skeletonizes each label from its bounding-box crop.

Each streaming stage is bit-identical to its dense counterpart
(tests/test_streamseg.py, tests/test_skeleton.py). The reference
pipeline densifies at every one of these joints (reference
inference.py:196-254), capping volumes at host RAM; this pipeline's cap
is disk. Runs on synthetic data so it works anywhere (CPU or TPU).

Usage::

    python examples/run_beyond_ram.py [work_dir]
"""

import os
import sys
import tempfile
import zipfile

# Allow running straight from a source checkout (python examples/...).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    os.makedirs(work, exist_ok=True)

    from aind_exaspim_neuron_segmentation_tpu import inference
    from aind_exaspim_neuron_segmentation_tpu.io import read
    from aind_exaspim_neuron_segmentation_tpu.io.zarr_lite import (
        ZarrAppendWriter,
    )

    # --- synthesize a slab-streamed uint16 image store (stand-in for
    # an ExaSPIM acquisition; never dense) -------------------------------
    dim = (192, 128, 128)
    img_path = os.path.join(work, "image.zarr")
    rng = np.random.default_rng(0)
    writer = ZarrAppendWriter(img_path, dim, np.uint16)
    for z0 in range(0, dim[0], 32):
        slab = rng.integers(0, 300, (32,) + dim[1:]).astype(np.uint16)
        for _ in range(4):  # a few bright blobs per slab
            cz, cy, cx = rng.integers(8, 24), *rng.integers(20, 108, 2)
            slab[cz - 6: cz + 7, cy - 6: cy + 7, cx - 6: cx + 7] = 1200
        writer.append(slab)
    writer.close()
    print(f"image store: {img_path} {dim}")

    # --- stage 1: streaming inference -----------------------------------
    runner = inference.load_model(affinity_mode=True)
    aff_path = os.path.join(work, "affinities.zarr")
    inference.predict(read(img_path), runner, out_path=aff_path,
                      verbose=False)
    print(f"affinities streamed to {aff_path}")

    # --- stage 2: streaming segmentation --------------------------------
    seg_path = os.path.join(work, "segmentation.zarr")
    labels = inference.affinities_to_segmentation(
        read(aff_path), out_path=seg_path, tmp_dir=work,
    )
    print(f"segmentation streamed to {seg_path} (shape {labels.shape})")

    # --- stage 3: streaming skeletonization -----------------------------
    zip_path = os.path.join(work, "swcs.zip")
    inference.segmentation_to_zipped_swcs(labels, zip_path)
    n = len(zipfile.ZipFile(zip_path).namelist())
    print(f"{n} skeletons -> {zip_path}")


if __name__ == "__main__":
    main()
