"""Typed configuration for the T* search pipeline.

The reference framework wires its defaults through per-script argparse
parsers (reference ``run_TStarDemo.py:14-31``, ``TStar/TStarFramework.py:26-39,
190-201``, ``LVHaystackBench/run_TStar_onDataset.py:154-178``).  Here a single
dataclass carries every knob, with the reference's default values preserved:

* search_nframes = 8, grid 4x4            (TStarFramework.py:33-35)
* confidence_threshold = 0.6 demo / 0.7 dataset
                                          (run_TStarDemo.py:27, run_TStar_onDataset.py:174)
* search_budget fraction, capped at 1000 scored frames
                                          (interface_searcher.py:70)
* sampling fps = 1                        (interface_searcher.py:57)
* score init 1e-6, P init 0.3*conf       (interface_searcher.py:73-75)
* target weight 1.0, cue weight 0.5       (interface_searcher.py:89-91)
* window size 5, decay score/(|off|+1)    (interface_searcher.py:215-241)
* spline smoothing s=0.5                  (interface_searcher.py:265)
* detector post-process threshold 0.005   (interface_heuristic.py:243)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """Static (trace-time) configuration of the T* search engine."""

    # --- core search knobs (reference defaults) ---
    search_nframes: int = 8
    grid_rows: int = 4
    grid_cols: int = 4
    confidence_threshold: float = 0.6
    search_budget: float = 0.5        # fraction of 1-fps frames; see budget_frames()
    budget_cap: int = 1000            # hard cap on scored frames (interface_searcher.py:70)
    sampling_fps: float = 1.0         # score-grid rate (interface_searcher.py:57)

    # --- distribution update (reference constants) ---
    window_size: int = 5              # neighborhood half-width for score splat
    spline_smoothing: float = 0.5     # residual target of the smoother
    score_init: float = 1e-6          # initial per-second score
    p_init_scale: float = 0.3         # P init = confidence_threshold * p_init_scale
    top_percentile: float = 75.0      # quartile used for window splat + sampling mask

    # --- detector-facing constants ---
    target_weight: float = 1.0
    cue_weight: float = 0.5
    detector_threshold: float = 0.005  # OWL-ViT post-process score threshold

    # Detector weight quantization (ours).  None = bf16 (production
    # default); "int8" quantizes the OWL-ViT vision encoder's dense layers
    # to W8A8 (models/owlvit_quant.py; int8 MXU at 2x the bf16 FLOP rate,
    # but pays dynamic activation-quant staging); "w8a16" keeps activations
    # bf16 and stores only the WEIGHTS int8 — tighter numerics than W8A8
    # but a measured 2-6% e2e perf LOSS vs bf16 (PERFORMANCE.md r5
    # post-mortem) — both opt-in until validated on real released weights.
    detector_quant: Optional[str] = None

    # Verification image size (ours; TPU throughput knob).  None = the
    # detector's native size (768 for OWL-ViT B/32, matching the reference's
    # processor resize).  A smaller side (e.g. 512) runs the verification
    # rescore with bilinearly interpolated position embeddings — verify
    # frames are upscaled cache frames, so little information is lost, and
    # verification is ~94% of worst-case search FLOPs.  Opt-in: it shifts
    # verification confidences slightly, which can change removal decisions
    # vs the reference semantics (the reference itself rescores at a
    # degraded 600x285, interface_searcher.py:403).
    verify_image_size: Optional[int] = None

    # Batched-search verification bucketing across videos (ours).  None/True:
    # candidates from ALL videos form one flat list, rescored verify_batch
    # images per forward — work proportional to the total candidate count
    # (the single-chip default; lifts batched worst case above the B=1 rate).
    # False: per-video buckets padded across the batch — keeps the video
    # axis aligned with a dp-sharded mesh, avoiding cross-shard frame
    # gathers (parallel/multi_video.py sets this automatically when
    # searching over a mesh with a sharded data axis).
    verify_flat: Optional[bool] = None

    # Verification rescore batch (ours; semantics-preserving optimization).
    # None = rescore all K sampled frames in one forward whenever any frame
    # triggers (reference-shaped worst case).  A small int T rescores only
    # the candidate frames, T at a time — typically 1 round of T instead of
    # K full-resolution forwards once detections are sparse/localized.
    # Default 8 (r4, scripts/ab_verify_width_batched.py): 8-image verify
    # forwards clear the fused-MHA batch>=8 gate that width 4 left off and
    # halve the bucket-loop rounds — batched worst case 1,081 vs 1,006 (w4)
    # vs 1,021 (w16) f/s at B=8, every rep, while staying near
    # work-proportional (overshoot <=7 frames per verify event vs w4's <=3;
    # for 5<=candidates<=8 width 8 does EQUAL work in fewer rounds).
    verify_batch: Optional[int] = 8

    # Adaptive verification width (ours; VERDICT r3 item 4).  The bucketed
    # form wins when candidates are sparse, the one-shot rescore-all form
    # wins the candidate-dense corner (r3: 1007 vs 906 f/s single-video
    # when ALL 16 frames are candidates — small verify forwards tile worse
    # than one big batch).  True (default): each step lax.cond-selects the
    # wide path when candidates > K/2 — trajectory-identical either way
    # (the replay reads only candidate rows, which both paths fill the
    # same).  Applies to the single-video engine; the batched path keeps
    # global bucketing unconditionally (measured better even in its worst
    # case: work is proportional to the TOTAL candidate count there).
    verify_adaptive: bool = True

    # --- fixed-shape padding (TPU: everything static) ---
    max_objects: int = 16             # targets + cues + padding prompt, padded
    max_targets: int = 8              # remaining-target mask length, padded
    frame_pad_multiple: int = 128     # pad N (video seconds) to a lane multiple

    # --- pixel pipeline geometry (reference sizes) ---
    cell_hw: Tuple[int, int] = (95, 200)      # grid cell size (interface_searcher.py:186)
    frame_hw: Tuple[int, int] = (380, 800)    # sampled-frame resize (interface_searcher.py:362)
    verify_hw: Tuple[int, int] = (285, 600)   # verification resize (interface_searcher.py:403)
    # HBM frame-cache resolution (ours).  Chosen TPU-aligned: height % 32 == 0
    # and width*3 % 128 == 0 so the fused Pallas grid builder can DMA frames
    # directly; also >= the 192px detector cell in both dims.
    cache_hw: Tuple[int, int] = (192, 384)
    # Frame-cache residency policy (ours; VERDICT r4 item 3):
    #   "auto"      — decode-once HBM cache when it fits the budget, else the
    #                 host-paged STREAMING cache at FULL cache_hw resolution
    #                 (duration-independent memory, like the reference's
    #                 decode-on-demand, interface_searcher.py:157-169);
    #   "resident"  — always decode-once to HBM (raises if over budget);
    #   "streaming" — always page from host per iteration;
    #   "downscale" — legacy r2-r4 behavior: shrink cache_hw until the HBM
    #                 cache fits (accuracy-affecting; explicit opt-in now).
    cache_mode: str = "auto"

    # --- engine behaviour (ours) ---
    deterministic_pop: bool = False   # True: top-k keyframes instead of sampled
    max_iterations: Optional[int] = None  # override; default derived from budget
    # Fused Pallas grid builder (kernels/pallas_grid.py).  None (default)
    # resolves to OFF: measured slower than XLA's gather+matmul path end-to-
    # end (604 vs 678 f/s, r2 v5e — see the kernel docstring).  Set True
    # explicitly to use it on TPU with a tile-aligned cache (height % 32,
    # width*3 % 128); the batched multi-video path always falls back to XLA.
    use_pallas_preprocess: Optional[bool] = None

    @property
    def frames_per_iteration(self) -> int:
        return self.grid_rows * self.grid_cols

    def budget_frames(self, total_frame_num: int) -> int:
        """Scored-frame budget: min(cap, N * fraction) (interface_searcher.py:70)."""
        return int(min(self.budget_cap, total_frame_num * self.search_budget))

    def iteration_cap(self, total_frame_num: int) -> int:
        """Max search iterations implied by the budget (ceil division)."""
        if self.max_iterations is not None:
            return self.max_iterations
        per = self.frames_per_iteration
        return max(1, -(-self.budget_frames(total_frame_num) // per))

    def padded_frames(self, total_frame_num: int) -> int:
        m = self.frame_pad_multiple
        return max(m, ((total_frame_num + m - 1) // m) * m)


@dataclasses.dataclass(frozen=True)
class FrameworkConfig:
    """End-to-end framework configuration (grounder + searcher + QA)."""

    search: SearchConfig = dataclasses.field(default_factory=SearchConfig)

    grounder: str = "gpt-4o"           # backend name, substring-dispatched
    heuristic: str = "owl-vit"         # detector backend name
    grounding_num_frames: int = 8      # frames shown to the grounder VLM
    qa_temperature: float = 0.2        # QA sampling temperature
    qa_max_tokens: int = 30            # QA generation cap (interface_grounding.py:443)
    output_dir: str = "./output"
    save_artifacts: bool = True        # keyframe JPEGs / GIF / score plot
    seed: int = 0                      # PRNG seed for the search (ours; reference unseeded)


def demo_config(**overrides) -> FrameworkConfig:
    """Defaults matching the demo CLI (run_TStarDemo.py:14-31)."""
    search = SearchConfig(confidence_threshold=0.6, search_budget=0.5)
    return dataclasses.replace(FrameworkConfig(search=search), **overrides)


def dataset_config(**overrides) -> FrameworkConfig:
    """Defaults matching the dataset runner (run_TStar_onDataset.py:154-178)."""
    search = SearchConfig(confidence_threshold=0.7, search_budget=1.0)
    return dataclasses.replace(FrameworkConfig(search=search), **overrides)
