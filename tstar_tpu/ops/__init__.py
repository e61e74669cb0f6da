from tstar_tpu.ops.percentile import masked_percentile  # noqa: F401
from tstar_tpu.ops.sampling import (  # noqa: F401
    gumbel_topk_without_replacement,
    uniform_stride_indices,
)
from tstar_tpu.ops.splat import (  # noqa: F401
    splat_detections_to_cells,
    window_splat,
)
from tstar_tpu.ops.smoother import smoothing_spline_distribution  # noqa: F401
from tstar_tpu.ops.nms import batched_class_nms, box_iou, nms  # noqa: F401
