"""Multi-chip scaling: mesh construction, sharded inference, sharded stats.

All new architecture relative to the single-device reference
(SURVEY.md section 2.3).
"""

from aind_exaspim_neuron_segmentation_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    make_mesh,
    make_mesh_2d,
    replicated,
    sharded_first_axis,
)
from aind_exaspim_neuron_segmentation_tpu.parallel.sharded_inference import (  # noqa: F401,E501
    predict_sharded,
)
from aind_exaspim_neuron_segmentation_tpu.parallel.stats import (  # noqa: F401
    order_stat,
    percentile_device,
    percentile_sharded,
)
