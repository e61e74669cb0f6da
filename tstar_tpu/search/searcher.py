"""High-level searcher: the reference ``TStarSearcher`` API over the engine.

Public surface parity with ``TStar/interface_searcher.py:21-91,444-538``:
constructor signature (video_path, heuristic, target_objects, cue_objects,
search_nframes, image_grid_shape, search_budget, confidence_threshold, ...),
``search()`` / ``search_with_visualization()`` returning (keyframes,
timestamps), introspection state (``P``, ``score_distribution``,
``non_visiting_frames``, ``P_history``, ``Score_history``,
``non_visiting_history``), and ``plot_score_distribution()``.

NOTE on defaults: this class keeps the *framework-level* defaults
(grid (4,4), budget 0.5, confidence 0.6 — ``TStarFramework.py:33-38``,
``run_tstar`` ``:194-201``).  The reference ``TStarSearcher`` constructor
itself defaults to grid (8,8), budget 0.1, confidence 0.5
(``interface_searcher.py:21-40``) but is never instantiated with those
defaults by any first-party caller; code ported from the reference that
relies on the bare-constructor defaults must pass them explicitly.

Under the hood: one decode sweep fills the device frame cache, the heuristic
backend builds a jittable scorer, and the whole search runs on-device
(``search()``) or host-stepped for history capture
(``search_with_visualization()``).  The reference's two byte-identical search
loops (interface_searcher.py:444-491 vs :493-538) collapse into one engine.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from tstar_tpu.search.engine import run_search, run_search_with_history
from tstar_tpu.search.state import init_state
from tstar_tpu.utils.config import SearchConfig
from tstar_tpu.video.cache import FrameCache, build_frame_cache
from tstar_tpu.video.decoder import open_video

logger = logging.getLogger(__name__)

# Module-level jit: repeated searches retrace once per shape.  State and
# scorer are ARGUMENTS (closing over the frame cache would inline it into
# the HLO as a constant — the relay rejects those payloads).
_run_search_jit = jax.jit(run_search, static_argnums=2)


class KeyframeSearcher:
    def __init__(
        self,
        video_path: str,
        heuristic,
        target_objects: Sequence[str],
        cue_objects: Sequence[str],
        search_nframes: int = 8,
        image_grid_shape: Tuple[int, int] = (4, 4),
        search_budget: float = 0.5,
        confidence_threshold: float = 0.6,
        output_dir: Optional[str] = None,
        config: Optional[SearchConfig] = None,
        seed: int = 0,
        cache: Optional[FrameCache] = None,
    ):
        base = config or SearchConfig()
        import dataclasses

        self.config = dataclasses.replace(
            base,
            search_nframes=search_nframes,
            grid_rows=image_grid_shape[0],
            grid_cols=image_grid_shape[1],
            search_budget=search_budget,
            confidence_threshold=confidence_threshold,
        )
        self.video_path = video_path
        self.target_objects = list(target_objects)
        self.cue_objects = list(cue_objects)
        self.output_dir = output_dir
        self.seed = seed

        self.cache = cache or build_frame_cache(video_path, self.config)
        self.total_frame_num = self.cache.n_valid
        self.raw_fps = self.cache.raw_fps
        self.duration = self.cache.duration
        self.fps = self.config.sampling_fps

        # Detector binding (reference reparameterize_object_list,
        # interface_searcher.py:85-91).
        self.scorer = heuristic.build_scorer(
            self.cache.frames, self.target_objects, self.cue_objects, self.config
        )

        self._state0 = init_state(
            self.cache.n_valid,
            len(self.target_objects),
            self.config,
            jax.random.key(seed),
            n_pad=self.cache.n_pad,
        )
        self._final_state = None
        self.P_history: List[List[float]] = []
        self.Score_history: List[List[float]] = []
        self.non_visiting_history: List[List[float]] = []
        self.sampled_history: List[List[int]] = []
        # Per-iteration raw detections on the grid image (reference
        # detect_bbox_iters, interface_searcher.py:80-82,469-474): list of
        # {"boxes" (D,4) xyxy in detector-image px, "scores", "class_ids"}.
        self.detect_bbox_iters: List[Dict[str, np.ndarray]] = []

    # -- introspection (reference attribute parity) -----------------------
    def _np(self, arr) -> np.ndarray:
        return np.asarray(arr)[: self.total_frame_num]

    @property
    def P(self) -> np.ndarray:
        state = self._final_state if self._final_state is not None else self._state0
        return self._np(state.P)

    @property
    def score_distribution(self) -> np.ndarray:
        state = self._final_state if self._final_state is not None else self._state0
        return self._np(state.scores)

    @property
    def non_visiting_frames(self) -> np.ndarray:
        state = self._final_state if self._final_state is not None else self._state0
        return 1.0 - self._np(state.visited).astype(np.float32)

    @property
    def remaining_targets(self) -> List[str]:
        state = self._final_state if self._final_state is not None else self._state0
        mask = np.asarray(state.remaining)
        return [t for i, t in enumerate(self.target_objects) if mask[i]]

    # -- search entry points ----------------------------------------------
    def search(self) -> Tuple[List[np.ndarray], List[float]]:
        """Full search in ONE device dispatch (jitted ``run_search``
        while_loop) — bit-identical to the chained form.

        Routed to the while_loop driver in r4: the sparse-regime A/B
        (scripts/ab_b1_dispatch.py, v5e through the axon relay) measured
        the chained form dispatch-bound at B=1 — median 6.3k f/s with a
        35% tenancy spread vs the while_loop's 9.6k at ±2% — and the
        compute-bound worst case equal-or-better (1010 vs 999 f/s).  The
        single dispatch deletes the per-step host round-trip, which is the
        reference's own per-iteration overhead this framework exists to
        remove (interface_searcher.py:444-491).

        Streaming caches (multi-hour videos over the HBM budget,
        video/cache.StreamingFrameCache) instead run the host-paged driver:
        per-iteration seek-decode of exactly the sampled frames at FULL
        resolution — duration-independent memory, same trajectory."""
        from tstar_tpu.video.cache import StreamingFrameCache

        if isinstance(self.cache, StreamingFrameCache):
            from tstar_tpu.search.engine import run_search_streaming

            final, secs = run_search_streaming(
                self._state0, self.scorer, self.cache, self.config
            )
        else:
            final, secs = _run_search_jit(
                self._state0, self.scorer, self.config
            )
        self._final_state = jax.device_get(final)
        self._record_final_history()
        return self._materialize(np.asarray(secs))

    def search_with_visualization(self) -> Tuple[List[np.ndarray], List[float]]:
        """Host-stepped search capturing per-iteration histories."""
        from tstar_tpu.video.cache import StreamingFrameCache

        if isinstance(self.cache, StreamingFrameCache):
            raise ValueError(
                "search_with_visualization requires a device-resident frame "
                "cache (history grids re-render from cached frames); this "
                "video streams because its full-resolution cache exceeds the "
                "HBM budget. Use search(), or cache_mode='downscale' to "
                "trade cache resolution for visualization."
            )
        final, secs, history = run_search_with_history(
            self._state0, self.scorer, self.config
        )
        self._final_state = jax.device_get(final)
        for snap in history:
            n = self.total_frame_num
            self.P_history.append(snap["P"][:n].tolist())
            self.Score_history.append(snap["scores"][:n].tolist())
            self.non_visiting_history.append(
                (1.0 - snap["visited"][:n].astype(np.float32)).tolist()
            )
            self.sampled_history.append(snap["secs"].tolist())
            if "detections" in snap:
                d = snap["detections"]
                valid = np.asarray(d["valid"])
                self.detect_bbox_iters.append(
                    {
                        "boxes": np.asarray(d["boxes"])[valid],
                        "scores": np.asarray(d["scores"])[valid],
                        "class_ids": np.asarray(d["class_ids"])[valid],
                    }
                )
        return self._materialize(np.asarray(secs))

    def _record_final_history(self):
        if not self.P_history:
            self.P_history.append(self.P.tolist())
            self.Score_history.append(self.score_distribution.tolist())
            self.non_visiting_history.append(self.non_visiting_frames.tolist())

    def _materialize(self, secs: np.ndarray) -> Tuple[List[np.ndarray], List[float]]:
        """Decode final keyframes at native resolution; timestamps in seconds
        (pop_frames contract, interface_searcher.py:373-380)."""
        timestamps = [float(s) / self.fps for s in secs]
        frame_indices = [int(t * self.raw_fps) for t in timestamps]
        dec = open_video(self.video_path)
        try:
            frames = list(dec.decode_batch(frame_indices))
        finally:
            dec.close()
        return frames, timestamps

    # -- snapshot / resume (SURVEY.md §5.4) ---------------------------------
    def save_snapshot(self, path: str) -> str:
        """Persist the current search state (resumable mid-video)."""
        from tstar_tpu.search.snapshot import save_state

        state = self._final_state if self._final_state is not None else self._state0
        return save_state(state, path)

    def restore_snapshot(self, path: str) -> None:
        """Resume from a snapshot: the next search() continues the exact
        stochastic trajectory (the PRNG key is part of the state)."""
        from tstar_tpu.search.snapshot import load_state

        self._state0 = load_state(path)
        self._final_state = None

    # -- artifacts ----------------------------------------------------------
    def plot_score_distribution(self, save_path: Optional[str] = None):
        from tstar_tpu.viz.artifacts import plot_score_distribution

        plot_score_distribution(
            self.score_distribution, self.duration, save_path=save_path
        )

    def grid_images(self, annotate: bool = True) -> List[np.ndarray]:
        """Re-render the sampled grids per iteration (visualization sink).

        With ``annotate`` (default) and a recorded detection history, each
        grid carries its iteration's detection boxes + labels — the
        reference's annotated search GIF (interface_searcher.py:469-474).
        """
        from tstar_tpu.viz.artifacts import render_grid_image
        from tstar_tpu.viz.boxes import draw_boxes

        cache = np.asarray(self.cache.frames)
        rows, cols = self.config.grid_rows, self.config.grid_cols
        grids = [
            render_grid_image(
                cache, secs, (rows, cols), cell_hw=self.config.cell_hw
            )
            for secs in self.sampled_history
        ]
        if not annotate or not self.detect_bbox_iters:
            return grids
        det_size = getattr(self.scorer, "detection_image_size", None)
        if det_size is None:
            return grids
        names = self.target_objects + self.cue_objects + [" "]
        ch, cw = self.config.cell_hw
        sx, sy = cols * cw / det_size, rows * ch / det_size
        out = []
        for grid, dets in zip(grids, self.detect_bbox_iters):
            boxes = np.asarray(dets["boxes"], np.float64) * [sx, sy, sx, sy]
            labels = [
                f"{names[c] if c < len(names) else c} {s:.2f}"
                for c, s in zip(dets["class_ids"], dets["scores"])
            ]
            out.append(
                draw_boxes(grid, boxes, labels=labels,
                           class_ids=list(dets["class_ids"]))
            )
        out.extend(grids[len(out):])
        return out

    @property
    def detect_annotot_iters(self) -> List[np.ndarray]:
        """Annotated grid per iteration (reference attribute name parity,
        interface_searcher.py:80-82 — sic: 'annotot')."""
        return self.grid_images(annotate=True)


# Reference-compatible alias (TStar/interface_searcher.py:14).
TStarSearcher = KeyframeSearcher
