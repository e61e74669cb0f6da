"""Task-2 evidence run: a 24-video batched search FITS and RUNS on one chip.

r2 measured B=24 x 1024 s videos OOMing a 16 GB v5e at the default 192x384
cache.  With the batch-aware HBM budget (video/cache.per_video_hbm_budget +
parallel/multi_video release discipline) the bucket's caches auto-downscale
and the whole batch runs.  This script builds 24 synthetic ~17-minute
videos (cheap 2 fps encode; only the DURATION matters for cache size),
searches them in one bucket through the production `search_videos` path,
and prints the aggregate rate + the resolution the budget chose.

    python scripts/bench_b24_budget.py [--videos 24] [--duration 1030]
"""

import argparse
import json
import logging
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=24)
    ap.add_argument("--duration", type=float, default=1030.0)
    ap.add_argument("--budget", type=float, default=0.25,
                    help="search budget fraction (0.25 keeps the run short; "
                         "memory pressure is set by cache size, not budget)")
    ap.add_argument("--hbm_pool", type=float, default=None,
                    help="override the detected device pool (GiB)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tstar_tpu.framework.heuristics import initialize_heuristic
    from tstar_tpu.parallel.multi_video import VideoTask, search_videos
    from tstar_tpu.utils.config import SearchConfig
    from tstar_tpu.video.cache import per_video_hbm_budget
    from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

    tmp = tempfile.mkdtemp(prefix="b24_")
    t0 = time.perf_counter()
    tasks = []
    for i in range(args.videos):
        path = os.path.join(tmp, f"v{i}.mp4")
        ev = args.duration * (0.3 + 0.4 * i / max(1, args.videos))
        write_synthetic_video(
            path, duration_sec=args.duration, fps=2.0, hw=(96, 160),
            objects=[PlantedObject("couch", (ev, ev + 6.0), (200, 40, 40),
                                   (0.5, 0.5), 0.4)],
        )
        tasks.append(VideoTask(path, ["couch"], ["tv"], seed=i))
    synth_s = time.perf_counter() - t0

    cfg = SearchConfig(search_budget=args.budget, confidence_threshold=2.0)
    pool = int(args.hbm_pool * 2 ** 30) if args.hbm_pool else None
    budget = per_video_hbm_budget(args.videos, total_bytes=pool)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        print("device memory_stats bytes_limit:", stats.get("bytes_limit"))
    except Exception as e:
        print("memory_stats unavailable:", e)
    t0 = time.perf_counter()
    results = search_videos(tasks, initialize_heuristic("owl-vit-random"), cfg,
                            hbm_budget_bytes=pool)
    search_s = time.perf_counter() - t0

    frames = sum(r["iterations"] * cfg.frames_per_iteration for r in results)
    dev = jax.devices()[0]
    print(json.dumps({
        "videos": len(results),
        "duration_s_each": args.duration,
        "per_video_hbm_budget_mb": round(budget / 2 ** 20, 1),
        "synthesize_s": round(synth_s, 1),
        "search_s": round(search_s, 1),
        "frames_scored": frames,
        "frames_per_sec": round(frames / search_s, 1),
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "oom": False,
    }))


if __name__ == "__main__":
    main()
