"""Hour-scale streaming-cache benchmark (VERDICT r4 item 3 done-criterion).

Synthesizes an N-hour video, then searches it three ways on the real chip:

  * resident  — decode-once HBM cache (the fast path; fits for <=~7 h at the
                default 192x384 under the 6 GB single-video budget)
  * streaming — host-paged per-iteration seek-decode at FULL cache_hw
                (duration-independent memory; what >HBM-budget videos use)

and asserts the resident and streaming searches return IDENTICAL keyframes
(trajectory identity at full scale, not just the test fixture's 60 s).

Run on the real chip (background shell; first compile ~2-4 min):
    python scripts/bench_streaming.py --hours 1
    python scripts/bench_streaming.py --hours 4 --skip_resident
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_video(hours: float, hw=(192, 384), fps: float = 2.0) -> str:
    from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

    path = f"/tmp/tstar_stream_bench_{hours:g}h_{hw[0]}x{hw[1]}.mp4"
    if os.path.exists(path) and os.path.getsize(path) > 0:
        return path
    dur = hours * 3600.0
    t0 = time.perf_counter()
    write_synthetic_video(
        path, duration_sec=dur, fps=fps, hw=hw,
        objects=[
            PlantedObject(
                "couch", (dur * 0.6, dur * 0.6 + 30.0), (200, 40, 40),
                (0.5, 0.5), 0.5,
            )
        ],
    )
    print(f"synthesized {hours:g} h video in {time.perf_counter()-t0:.0f}s "
          f"-> {path}", flush=True)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=1.0)
    ap.add_argument("--budget", type=float, default=0.05,
                    help="search budget (fraction of seconds scored)")
    ap.add_argument("--skip_resident", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from tstar_tpu.framework.heuristics import initialize_heuristic
    from tstar_tpu.search.searcher import KeyframeSearcher
    from tstar_tpu.utils.config import SearchConfig
    from tstar_tpu.video.cache import StreamingFrameCache, build_frame_cache

    path = synth_video(args.hours)
    # Detection-sparse thresholds: verification never fires, so the timing
    # isolates the streaming overhead (per-iteration host decode + upload)
    # against the resident path's pure on-device steps — the HARDEST regime
    # for streaming relative overhead.
    cfg = SearchConfig(
        search_budget=args.budget, confidence_threshold=2.0,
        detector_threshold=10.0, deterministic_pop=True,
    )
    heuristic = initialize_heuristic("owl-vit-random")
    n_valid = int(args.hours * 3600)
    iters = cfg.iteration_cap(n_valid)
    frames_scored = iters * cfg.frames_per_iteration
    out = {
        "hours": args.hours, "n_valid": n_valid, "iterations": iters,
        "frames_scored": frames_scored,
        "cache_hw": list(cfg.cache_hw),
    }

    def timed(label, fn):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        out[f"{label}_secs"] = round(dt, 2)
        out[f"{label}_frames_per_sec"] = round(frames_scored / dt, 1)
        print(f"{label}: {dt:.1f}s ({out[f'{label}_frames_per_sec']} f/s)",
              flush=True)
        return r

    secs_resident = None
    if not args.skip_resident:
        t0 = time.perf_counter()
        cache = build_frame_cache(path, cfg)
        out["resident_decode_secs"] = round(time.perf_counter() - t0, 2)
        out["resident_cache_gb"] = round(
            cache.frames.size / 1024 ** 3, 2
        )
        s = KeyframeSearcher(
            path, heuristic, ["couch"], ["chair"], config=cfg, seed=7,
            cache=cache,
        )
        s.search()  # compile
        s2 = KeyframeSearcher(
            path, heuristic, ["couch"], ["chair"], config=cfg, seed=7,
            cache=cache,
        )
        _, ts = timed("resident", s2.search)
        secs_resident = ts
        del cache, s, s2

    import dataclasses as dc

    stream_cfg = dc.replace(cfg, cache_mode="streaming")
    stream = build_frame_cache(path, stream_cfg)
    assert isinstance(stream, StreamingFrameCache)
    s = KeyframeSearcher(
        path, heuristic, ["couch"], ["chair"], config=cfg, seed=7,
        cache=stream,
    )
    _, ts_stream = timed("streaming", s.search)
    stream.close()
    if secs_resident is not None:
        assert ts_stream == secs_resident, (
            f"streaming diverged from resident: {ts_stream} vs {secs_resident}"
        )
        out["trajectory_identical"] = True

    dev = jax.devices()[0]
    out["device_kind"] = getattr(dev, "device_kind", str(dev))
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
