"""Reference-architecture ablation baseline for benchmarking.

A faithful re-creation of the reference's runtime ARCHITECTURE (per-iteration
host round-trips: host sampling -> host cv2 resize/grid assembly -> one
detector forward on device -> detections back to host -> host splat + scipy
spline refit; reference ``TStar/interface_searcher.py:444-491`` data flow)
running the SAME detector weights on the SAME chip as the TPU-native engine.
``bench.py`` reports the TPU-native engine's throughput relative to this —
an apples-to-apples measure of the architectural speedup (decode excluded
from both sides; the reference additionally re-decodes frames every
iteration, so the real-world gap is larger).
"""

from __future__ import annotations

import time
from typing import Tuple

import numpy as np

F32 = np.float32


def reference_style_search(
    detector_forward,        # jitted: normalized (1,S,S,3) -> (scores, cls, boxes) on device
    cache: np.ndarray,       # (N, ch, cw, 3) uint8 host-side 1-fps frames
    n_valid: int,
    class_weights: np.ndarray,
    n_targets: int,
    config,
    detector_size: int = 768,
    rng: np.random.Generator | None = None,
) -> Tuple[int, float]:
    """Run the host-loop search to budget exhaustion.

    Returns (frames_scored, wall_seconds).
    """
    import cv2
    import jax
    import jax.numpy as jnp
    from scipy.interpolate import UnivariateSpline

    from tstar_tpu.kernels.image import CLIP_MEAN, CLIP_STD

    rng = rng or np.random.default_rng(0)
    k = config.frames_per_iteration
    rows, cols = config.grid_rows, config.grid_cols
    cell_h, cell_w = detector_size // rows, detector_size // cols

    scores = np.full(n_valid, config.score_init, F32)
    non_visiting = np.ones(n_valid, F32)
    p = np.full(n_valid, config.confidence_threshold * config.p_init_scale, F32)
    budget = config.budget_frames(n_valid)
    remaining = n_targets
    iteration = 0
    frames_scored = 0

    def preprocess(secs: np.ndarray) -> np.ndarray:
        cells = [
            cv2.resize(cache[s], (cell_w, cell_h), interpolation=cv2.INTER_LINEAR)
            for s in secs
        ]
        grid = np.vstack(
            [np.hstack(cells[r * cols : (r + 1) * cols]) for r in range(rows)]
        )
        norm = (grid.astype(F32) / 255.0 - CLIP_MEAN) / CLIP_STD
        return norm[None]

    t0 = time.perf_counter()
    while remaining > 0 and budget > 0:
        # --- host sampling ---
        if iteration == 0:
            secs = np.arange(k) * (n_valid // k)
        else:
            w = (p + k / n_valid) * non_visiting
            thr = np.percentile(w, config.top_percentile)
            masked = w * (w >= thr)
            if masked.sum() == 0 or (masked > 0).sum() < k:
                masked = p + k / n_valid
            masked = masked / masked.sum()
            secs = rng.choice(n_valid, size=k, replace=False, p=masked)

        # --- host preprocess -> device forward -> host detections ---
        pixels = preprocess(secs)
        s, c, b = jax.device_get(detector_forward(jnp.asarray(pixels)))
        budget -= k
        frames_scored += k

        # --- host splat (cell max of weighted confidences) ---
        keep = s[0] > config.detector_threshold
        cx = (b[0, :, 0] + b[0, :, 2]) / 2
        cy = (b[0, :, 1] + b[0, :, 3]) / 2
        gx = np.clip((cx / (detector_size / cols)).astype(int), 0, cols - 1)
        gy = np.clip((cy / (detector_size / rows)).astype(int), 0, rows - 1)
        cell = gy * cols + gx
        conf_map = np.zeros(k, F32)
        adj = np.where(keep, s[0] * class_weights[c[0]], 0.0)
        np.maximum.at(conf_map, cell, adj.astype(F32))

        # --- host state update + windowed splat + scipy spline refit ---
        scores[secs] = conf_map
        non_visiting[secs] = 0
        thr_c = np.percentile(conf_map, config.top_percentile)
        for kk in np.nonzero(conf_map >= thr_c)[0]:
            sec = int(secs[kk])
            center = scores[sec]
            for off in range(-config.window_size, config.window_size + 1):
                j = sec + off
                if 0 <= j < n_valid:
                    scores[j] = max(scores[j], center / (abs(off) + 1))
        visited_idx = np.nonzero(non_visiting == 0)[0]
        spline = UnivariateSpline(
            visited_idx, scores[visited_idx], s=config.spline_smoothing
        )
        vals = spline(np.arange(n_valid))
        adj2 = np.maximum(1.0 / n_valid, vals)
        p = (1.0 / (1.0 + np.exp(-adj2))).astype(F32)
        p /= p.sum()
        iteration += 1

    return frames_scored, time.perf_counter() - t0
