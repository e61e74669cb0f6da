"""Visualization sinks: score plots, search-iteration GIFs, grid renders.

Host-side, optional, and fully outside the jitted loop — the artifact set the
reference produces (score-distribution PNG ``interface_searcher.py:423-441``,
search-iteration GIF ``TStarFramework.py:148-160``, keyframe JPEGs ``:136-146``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def plot_score_distribution(
    scores: np.ndarray, duration: float, save_path: Optional[str] = None, show: bool = False
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.linspace(0, duration, len(scores))
    plt.figure(figsize=(12, 6))
    plt.plot(t, scores, label="Score Distribution")
    plt.xlabel("Time (seconds)")
    plt.ylabel("Score")
    plt.title("Score Distribution Over Time")
    plt.grid(True)
    plt.legend()
    if save_path:
        plt.savefig(save_path, format="png", dpi=150)
    if show:
        plt.show()
    plt.close()


def render_grid_image(
    cache: np.ndarray,               # (N_pad, ch, cw, 3) uint8
    secs: Sequence[int],
    grid_shape: Tuple[int, int],
    cell_hw: Tuple[int, int] = (95, 200),
) -> np.ndarray:
    """Rebuild the iteration's grid image from the frame cache (uint8)."""
    import cv2

    rows, cols = grid_shape
    h, w = cell_hw
    cells = [
        cv2.resize(cache[int(s)], (w, h), interpolation=cv2.INTER_LINEAR)
        for s in secs
    ]
    rows_img = [np.hstack(cells[r * cols : (r + 1) * cols]) for r in range(rows)]
    return np.vstack(rows_img)


def save_search_gif(grid_images: List[np.ndarray], output_gif_path: str):
    from tstar_tpu.utils.images import save_as_gif

    if grid_images:
        save_as_gif(grid_images, output_gif_path)
