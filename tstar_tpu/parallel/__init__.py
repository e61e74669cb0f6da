from tstar_tpu.parallel.mesh import make_mesh, data_sharding, replicated  # noqa: F401
from tstar_tpu.parallel.batched import (  # noqa: F401
    run_search_batched,
    run_search_batched_auto,
    run_search_batched_chained,
    batched_search_step,
    scorer_batch_axes,
)
from tstar_tpu.parallel.shardings import owlvit_param_shardings  # noqa: F401
from tstar_tpu.parallel.multi_video import VideoTask, search_videos  # noqa: F401
