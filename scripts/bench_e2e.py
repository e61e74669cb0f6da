"""End-to-end per-video wall-clock benchmark (BASELINE.md north-star).

Synthesizes a video, then runs the FULL framework path — grounding (fake),
C++ decode sweep into the HBM cache, on-device T* search with OWL-ViT
(random weights; throughput is weight-independent), keyframe decode — and
prints per-stage timings plus the per-video search wall-clock.

    python scripts/bench_e2e.py [--duration 600] [--budget 1.0]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--duration", type=float, default=600.0, help="video seconds")
    p.add_argument("--fps", type=float, default=24.0)
    p.add_argument("--budget", type=float, default=1.0)
    args = p.parse_args()

    from tstar_tpu.framework.framework import TStarFramework
    from tstar_tpu.framework.heuristics import initialize_heuristic
    from tstar_tpu.grounding.fake import FakeGrounder
    from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

    tmp = tempfile.mkdtemp(prefix="tstar_e2e_")
    video = os.path.join(tmp, "video.mp4")
    t0 = time.perf_counter()
    write_synthetic_video(
        video, duration_sec=args.duration, fps=args.fps, hw=(192, 320),
        objects=[
            PlantedObject("couch", (args.duration * 0.6, args.duration * 0.65),
                          (200, 40, 40), (0.5, 0.5), 0.4)
        ],
    )
    synth_t = time.perf_counter() - t0

    fw = TStarFramework(
        video_path=video,
        heuristic=initialize_heuristic("owl-vit-random"),
        grounder=FakeGrounder(target_objects=["couch"], cue_objects=["tv"]),
        question="What is the color of the couch?",
        options="A) Red\nB) Blue",
        output_dir=os.path.join(tmp, "out"),
        search_budget=args.budget,
        confidence_threshold=2.0,     # force full budget: worst-case search
        save_artifacts=False,
    )
    targets, cues = fw.get_grounded_objects()
    searcher = fw.initialize_videoSearcher(targets, cues)   # decode sweep here
    # warm the compile so the timing below is steady-state
    t0 = time.perf_counter()
    frames, timestamps = fw.perform_search(searcher, visualization=False)
    first_t = time.perf_counter() - t0

    searcher2 = fw.initialize_videoSearcher(targets, cues)
    t0 = time.perf_counter()
    frames, timestamps = fw.perform_search(searcher2, visualization=False)
    search_t = time.perf_counter() - t0

    budget_frames = searcher2.config.budget_frames(searcher2.total_frame_num)
    print(json.dumps({
        "video_seconds": args.duration,
        "synthesize_s": round(synth_t, 2),
        "search_first_incl_compile_s": round(first_t, 2),
        "per_video_search_wall_clock_s": round(search_t, 3),
        "frames_scored": budget_frames,
        "frames_scored_per_sec": round(budget_frames / search_t, 1),
        "keyframe_timestamps": timestamps,
    }, indent=2))


if __name__ == "__main__":
    main()
