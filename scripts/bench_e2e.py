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


def batch_main(args):
    """--batch: batched multi-video search with length bucketing and
    decode/compute overlap (the next bucket's FFmpeg decode runs on worker
    threads while the device searches the current bucket).

    Reports decode-only, search-only (caches pre-decoded), and overlapped
    wall-clocks: overlapped < decode + search is the decode being hidden."""
    import numpy as np

    from tstar_tpu.framework.heuristics import initialize_heuristic
    from tstar_tpu.parallel.multi_video import VideoTask, search_videos
    from tstar_tpu.utils.config import SearchConfig
    from tstar_tpu.video.cache import build_frame_cache_host
    from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

    tmp = tempfile.mkdtemp(prefix="tstar_e2e_batch_")
    durations = [args.duration, args.duration, 2.2 * args.duration]  # 2 buckets
    tasks = []
    for i, dur in enumerate(durations):
        path = os.path.join(tmp, f"v{i}.mp4")
        write_synthetic_video(
            path, duration_sec=dur, fps=args.fps, hw=(192, 320),
            objects=[PlantedObject("couch", (dur * 0.6, dur * 0.6 + 6),
                                   (200, 40, 40), (0.5, 0.5), 0.4)],
        )
        tasks.append(VideoTask(path, ["couch"], ["tv"], seed=i))

    cfg = SearchConfig(search_budget=args.budget, confidence_threshold=2.0)
    heuristic = initialize_heuristic("owl-vit-random")

    # decode-only cost (host FFmpeg sweep, no upload)
    t0 = time.perf_counter()
    for t in tasks:
        build_frame_cache_host(t.video_path, cfg)
    decode_t = time.perf_counter() - t0

    # warm compile with a throwaway run, then A/B prefetch on/off
    search_videos(tasks, heuristic, cfg)
    t0 = time.perf_counter()
    search_videos(tasks, heuristic, cfg, prefetch=False)
    serial_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    results = search_videos(tasks, heuristic, cfg, prefetch=True)
    overlapped_t = time.perf_counter() - t0

    frames = sum(cfg.budget_frames(int(d)) for d in durations)
    print(json.dumps({
        "videos": len(tasks),
        "durations_s": durations,
        "decode_only_s": round(decode_t, 2),
        "serial_buckets_s": round(serial_t, 2),
        "overlapped_s": round(overlapped_t, 2),
        "overlap_speedup": round(serial_t / overlapped_t, 3),
        "frames_scored_total": frames,
        "keyframes": {f"v{i}": r["keyframe_timestamps"]
                      for i, r in enumerate(results)},
        "note": "3 videos -> 2 length buckets; bucket i+1's decode+upload "
                "runs on threads during bucket i's device search "
                "(parallel/multi_video.py)",
    }, indent=2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--duration", type=float, default=600.0, help="video seconds")
    p.add_argument("--fps", type=float, default=24.0)
    p.add_argument("--budget", type=float, default=1.0)
    p.add_argument("--batch", action="store_true",
                   help="batched multi-video run with decode/compute overlap")
    args = p.parse_args()
    if args.batch:
        return batch_main(args)

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
