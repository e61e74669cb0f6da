from tstar_tpu.viz.artifacts import (  # noqa: F401
    plot_score_distribution,
    render_grid_image,
    save_search_gif,
)
from tstar_tpu.viz.boxes import draw_boxes  # noqa: F401
