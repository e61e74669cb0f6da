"""TStarFramework: the end-to-end orchestrator and public API.

Public-surface parity with the reference (``TStar/TStarFramework.py:21-223``):
``TStarFramework(video_path, heuristic, grounder, question, options, ...)``
with ``run()`` returning ``{"Grounding Objects", "Frame Timestamps",
"Answer"}``, plus the method set (``get_grounded_objects``,
``initialize_videoSearcher``, ``perform_search``, ``perform_qa``) and the
one-shot ``run_tstar()`` (defaults: grounder gpt-4o, heuristic owl-vit,
nframes 8, 4x4 grid, confidence 0.6, budget 0.5, ``:194-201``).

Pipeline: grounder VLM -> targets/cues; decode-once frame cache -> on-device
T* search -> keyframe timestamps; QA VLM on the decoded keyframes.
"""

from __future__ import annotations

import logging
import os
import re
import sys
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tstar_tpu.framework.heuristics import initialize_heuristic
from tstar_tpu.grounding.universal import UniversalGrounder
from tstar_tpu.search.searcher import KeyframeSearcher
from tstar_tpu.utils.config import SearchConfig

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s [%(levelname)s] %(message)s",
    handlers=[logging.StreamHandler(sys.stdout)],
)
logger = logging.getLogger(__name__)


def _safe_dirname(text: str) -> str:
    """Filesystem-safe run directory from a question (the reference chops the
    last char assuming a trailing '?', TStarFramework.py:48 — we sanitize)."""
    text = text.strip().rstrip("?")
    return re.sub(r"[^\w\s-]", "", text)[:120].strip() or "question"


class TStarFramework:
    def __init__(
        self,
        video_path: str,
        heuristic,
        grounder,
        question: str,
        options: str,
        search_nframes: int = 8,
        grid_rows: int = 4,
        grid_cols: int = 4,
        output_dir: str = "./output",
        confidence_threshold: float = 0.6,
        search_budget: float = 1000,
        config: Optional[SearchConfig] = None,
        seed: int = 0,
        save_artifacts: bool = True,
    ):
        self.video_path = video_path
        self.heuristic = heuristic
        self.grounder = grounder
        self.question = question
        self.options = options
        self.search_nframes = search_nframes
        self.grid_rows = grid_rows
        self.grid_cols = grid_cols
        self.confidence_threshold = confidence_threshold
        self.search_budget = search_budget
        self.config = config
        self.seed = seed
        self.save_artifacts = save_artifacts
        video_name = os.path.basename(video_path).split(".")[0]
        self.output_dir = os.path.join(
            output_dir, video_name, _safe_dirname(question)
        )
        os.makedirs(self.output_dir, exist_ok=True)
        self.results: dict = {}

    # -- steps (reference method-name parity) ------------------------------
    def get_grounded_objects(self) -> Tuple[List[str], List[str]]:
        targets, cues = self.grounder.inference_query_grounding(
            video_path=self.video_path, question=self.question, options=self.options
        )
        self.results["Grounding Objects"] = {
            "target_objects": targets, "cue_objects": cues
        }
        logger.info("Target objects: %s", targets)
        logger.info("Cue objects: %s", cues)
        return targets, cues

    def initialize_videoSearcher(
        self, target_objects: Sequence[str], cue_objects: Sequence[str]
    ) -> KeyframeSearcher:
        # Budget semantics (interface_searcher.py:70): the searcher always
        # computes min(1000, N * search_budget), whether search_budget is a
        # fraction (0.5) or the framework's int default (1000, which makes the
        # effective budget the full 1000-frame cap for any N >= 1).  The value
        # is passed through verbatim — budget_frames() applies the same
        # min(cap, N * budget) formula, so short videos still get the full cap
        # when budget is large (the sampler resamples visited seconds via the
        # starved-quartile fallback, matching the reference).
        cfg_budget = float(self.search_budget)
        base = self.config or SearchConfig()
        import dataclasses

        cfg = dataclasses.replace(base, search_budget=cfg_budget)
        return KeyframeSearcher(
            video_path=self.video_path,
            heuristic=self.heuristic,
            target_objects=list(target_objects),
            cue_objects=list(cue_objects),
            search_nframes=self.search_nframes,
            image_grid_shape=(self.grid_rows, self.grid_cols),
            search_budget=cfg_budget,
            confidence_threshold=self.confidence_threshold,
            output_dir=self.output_dir,
            config=cfg,
            seed=self.seed,
        )

    def perform_search(
        self, video_searcher: KeyframeSearcher, visualization: bool = False
    ) -> Tuple[List[np.ndarray], List[float]]:
        if visualization:
            frames, timestamps = video_searcher.search_with_visualization()
            if self.save_artifacts:
                self._save_frames(frames, timestamps)
                self._save_searching_iterations(video_searcher)
                self._plot_and_save_scores(video_searcher)
        else:
            frames, timestamps = video_searcher.search()
        logger.info("Found %d frames, timestamps: %s", len(frames), timestamps)
        return frames, timestamps

    def perform_qa(self, frames: List[np.ndarray]) -> str:
        return self.grounder.inference_qa(
            frames=frames, question=self.question, options=self.options
        )

    # -- artifact sinks -----------------------------------------------------
    def _save_frames(self, frames, timestamps):
        from tstar_tpu.utils.images import save_frames_as_jpegs

        paths = save_frames_as_jpegs(
            frames, timestamps, os.path.join(self.output_dir, "frames")
        )
        for p in paths:
            logger.info("Saved frame to %s", p)

    def _save_searching_iterations(self, video_searcher: KeyframeSearcher):
        from tstar_tpu.viz.artifacts import save_search_gif

        grids = video_searcher.grid_images()
        if grids:
            path = os.path.join(self.output_dir, "search_iterations.gif")
            save_search_gif(grids, path)
            logger.info("Saved search iterations GIF to %s", path)

    def _plot_and_save_scores(self, video_searcher: KeyframeSearcher):
        path = os.path.join(self.output_dir, "score_distribution.png")
        video_searcher.plot_score_distribution(save_path=path)
        logger.info("Score distribution plot saved to %s", path)

    # -- entry --------------------------------------------------------------
    def run(self) -> dict:
        from tstar_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        with timer.stage("grounding"):
            targets, cues = self.get_grounded_objects()
        with timer.stage("decode_and_setup"):
            searcher = self.initialize_videoSearcher(targets, cues)
        with timer.stage("search"):
            frames, timestamps = self.perform_search(searcher, visualization=True)
        with timer.stage("qa"):
            answer = self.perform_qa(frames)
        logger.info("Answer: %s", answer)
        self.results["Timings"] = timer.report()
        logger.info("Stage timings: %s", self.results["Timings"])
        return {
            "Grounding Objects": {"target_objects": targets, "cue_objects": cues},
            "Frame Timestamps": timestamps,
            "Answer": answer,
        }


def run_tstar(
    video_path: str,
    question: str,
    options: str,
    grounder: str = "gpt-4o",
    heuristic: str = "owl-vit",
    search_nframes: int = 8,
    grid_rows: int = 4,
    grid_cols: int = 4,
    confidence_threshold: float = 0.6,
    search_budget: float = 0.5,
    output_dir: str = "./output",
    seed: int = 0,
    config: Optional[SearchConfig] = None,
    **heuristic_kwargs,
) -> dict:
    """One-shot API (reference run_tstar, TStarFramework.py:190-223)."""
    grounder_obj = UniversalGrounder(model_name=grounder)
    heuristic_obj = initialize_heuristic(heuristic, **heuristic_kwargs)
    fw = TStarFramework(
        video_path=video_path,
        grounder=grounder_obj,
        heuristic=heuristic_obj,
        question=question,
        options=options,
        search_nframes=search_nframes,
        grid_rows=grid_rows,
        grid_cols=grid_cols,
        output_dir=output_dir,
        confidence_threshold=confidence_threshold,
        search_budget=search_budget,
        seed=seed,
        config=config,
    )
    return fw.run()
