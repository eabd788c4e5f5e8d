"""Model zoo: Flax UNet3D and PyTorch checkpoint interop."""

from aind_exaspim_neuron_segmentation_tpu.models.unet3d import (  # noqa: F401
    BatchNorm3d,
    DoubleConv,
    Down,
    UNet3D,
    Up,
    init_unet3d,
)
from aind_exaspim_neuron_segmentation_tpu.models.convert import (  # noqa: F401
    load_pth_variables,
    save_pth_checkpoint,
    torch_state_dict_to_variables,
    variables_to_torch_state_dict,
)
