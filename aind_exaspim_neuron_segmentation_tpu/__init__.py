"""TPU-native ExaSPIM neuron segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
AllenNeuralDynamics/aind-exaspim-neuron-segmentation:

* 3D U-Net affinity prediction (Flax, bf16 on MXU) over a sliding patch
  grid with overlap-blend stitching (reference: inference.py:29-126).
* Affinity -> instance segmentation via seeded watershed + hierarchical
  supervoxel agglomeration (native C++, reference dep ``waterz``).
* Skeletonization to zipped SWC archives via TEASAR (native C++,
  reference dep ``kimimaro``).
* Patch-sampling training loop (optax/orbax, reference: train.py).
* Multi-format volumetric IO (zarr/N5/TIFF, local + cloud-gated).
* Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` with halo
  exchange -- new architecture with no reference counterpart
  (SURVEY.md section 2.3).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy submodule access: keep `import aind_..._tpu` lightweight."""
    import importlib

    if name in (
        "core", "inference", "io", "machine_learning", "models", "native",
        "ops", "parallel", "postprocess", "utils",
    ):
        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
