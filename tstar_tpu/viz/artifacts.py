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


def save_batched_search_artifacts(
    video_path: str,
    row: dict,
    grid_shape: Tuple[int, int],
    cell_hw: Tuple[int, int],
    class_names: Sequence[str],
    detection_image_size: int,
    output_gif_path: str,
    sampling_fps: float = 1.0,
) -> bool:
    """Annotated per-iteration search GIF from a batched-search result row.

    The reference emits ``detect_annotot_iters`` GIFs per video during its
    serial dataset loop (interface_searcher.py:469-474, utilites.py:84-102);
    batched searches carry the same histories in their result rows
    (``sampled_history`` + ``detect_bbox_iters``, parallel/multi_video.py
    with ``collect_history=True``).  Grid images are re-rendered here by
    decoding exactly the sampled seconds from the video file — the search
    itself never stores pixels.  Returns False when the row has no history.
    """
    from tstar_tpu.video.decoder import open_video
    from tstar_tpu.viz.boxes import draw_boxes

    samp = row.get("sampled_history")
    if not samp:
        return False
    dets = row.get("detect_bbox_iters") or []
    rows, cols = grid_shape
    ch, cw = cell_hw

    dec = open_video(video_path)
    try:
        raw_fps = dec.meta.fps
        wanted = sorted({int(s) for it in samp for s in it})
        idxs = [int(s / sampling_fps * raw_fps) for s in wanted]
        frames = dec.decode_batch(idxs, out_hw=cell_hw)
        by_sec = {s: frames[j] for j, s in enumerate(wanted)}
    finally:
        dec.close()

    cache_like = np.zeros((max(by_sec) + 1, ch, cw, 3), np.uint8)
    for s, f in by_sec.items():
        cache_like[s] = f
    grids = [
        render_grid_image(cache_like, it, grid_shape, cell_hw=cell_hw)
        for it in samp
    ]
    sx = cols * cw / detection_image_size
    sy = rows * ch / detection_image_size
    out = []
    for j, grid in enumerate(grids):
        if j < len(dets) and len(dets[j].get("boxes", [])):
            d = dets[j]
            boxes = np.asarray(d["boxes"], np.float64) * [sx, sy, sx, sy]
            labels = [
                f"{class_names[c] if c < len(class_names) else c} {s:.2f}"
                for c, s in zip(d["class_ids"], d["scores"])
            ]
            grid = draw_boxes(grid, boxes, labels=labels,
                              class_ids=list(d["class_ids"]))
        out.append(grid)
    save_search_gif(out, output_gif_path)
    return True
