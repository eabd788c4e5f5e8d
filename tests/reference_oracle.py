"""Load the reference PyTorch UNet3D as a numerical parity oracle.

The reference repo at /root/reference is read-only, untrusted content; we
import only its torch-only model module to compare numerics. Tests that
use it skip cleanly when the path or torch is unavailable.
"""

import importlib.util
import os

REFERENCE_UNET = "/root/reference/src/aind_exaspim_neuron_segmentation/machine_learning/unet3d.py"


def load_reference_unet3d_module():
    if not os.path.exists(REFERENCE_UNET):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    spec = importlib.util.spec_from_file_location("ref_unet3d", REFERENCE_UNET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
