from tstar_tpu.kernels.image import (  # noqa: F401
    CLIP_MEAN,
    CLIP_STD,
    bilinear_resize,
    build_detector_grid,
    build_verify_batch,
    normalize_clip,
    pack_grid,
)
from tstar_tpu.kernels.pallas_grid import build_detector_grid_pallas  # noqa: F401
