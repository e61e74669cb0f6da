"""A/B: cache-resolution vs reference-resolution verification.

Compares removal decisions, final remaining-target sets, and keyframe
overlap between (a) the production engine's HBM-cache verification rescore
and (b) the reference's fidelity chain (raw re-decode + 600x285,
``interface_searcher.py:401-405``) on the same seeds.

With real detector weights (--checkpoint_dir, once a YOLO-World/OWL-ViT
checkpoint is on disk — zero-egress here) this quantifies the documented
fidelity deviation; with random weights it exercises the full mechanism.

    python scripts/verify_ab.py [--checkpoint_dir DIR] [--videos 3]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--videos", type=int, default=3)
    p.add_argument("--duration", type=float, default=120.0)
    p.add_argument("--confidence_threshold", type=float, default=0.3)
    args = p.parse_args()

    import jax

    from tstar_tpu.framework.heuristics import initialize_heuristic
    from tstar_tpu.search.engine import run_search_chained
    from tstar_tpu.search.reference_verify import (
        make_raw_frame_source,
        run_search_reference_verify,
    )
    from tstar_tpu.search.state import init_state
    from tstar_tpu.utils.config import SearchConfig
    from tstar_tpu.video.cache import build_frame_cache
    from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

    heuristic = initialize_heuristic(
        "owl-vit" if args.checkpoint_dir else "owl-vit-random",
        checkpoint_dir=args.checkpoint_dir,
    )
    cfg = SearchConfig(search_budget=1.0,
                       confidence_threshold=args.confidence_threshold)

    tmp = tempfile.mkdtemp(prefix="verify_ab_")
    rows = []
    for i in range(args.videos):
        path = os.path.join(tmp, f"v{i}.mp4")
        ev = args.duration * (0.4 + 0.1 * i)
        write_synthetic_video(
            path, duration_sec=args.duration, fps=12.0, hw=(192, 320),
            objects=[PlantedObject("couch", (ev, ev + 6.0), (200, 40, 40),
                                   (0.5, 0.5), 0.4)],
        )
        cache = build_frame_cache(path, cfg)
        scorer = heuristic.build_scorer(cache.frames, ["couch"], ["tv"], cfg)
        s0 = init_state(cache.n_valid, 1, cfg, jax.random.key(100 + i),
                        n_pad=cache.n_pad)

        fa, sa = run_search_chained(s0, scorer, cfg)
        source = make_raw_frame_source(path, cfg)
        try:
            fb, sb, decisions = run_search_reference_verify(
                s0, scorer, cfg, source, collect_decisions=True
            )
        finally:
            source.close()
        ka, kb = set(np.asarray(sa).tolist()), set(np.asarray(sb).tolist())
        rows.append({
            "video": f"v{i}",
            "iters_cache": int(fa.iteration),
            "iters_reference": int(fb.iteration),
            "remaining_cache": np.asarray(fa.remaining)[:1].tolist(),
            "remaining_reference": np.asarray(fb.remaining)[:1].tolist(),
            "removal_agree": bool(
                np.asarray(fa.remaining)[0] == np.asarray(fb.remaining)[0]
            ),
            "keyframe_overlap": len(ka & kb) / max(1, len(ka | kb)),
            "reference_rescores": len(decisions),
        })

    agree = sum(r["removal_agree"] for r in rows)
    print(json.dumps({
        "weights": "real" if args.checkpoint_dir else "random",
        "videos": len(rows),
        "removal_agreement": f"{agree}/{len(rows)}",
        "mean_keyframe_overlap": round(
            float(np.mean([r["keyframe_overlap"] for r in rows])), 3
        ),
        "per_video": rows,
    }, indent=2))


if __name__ == "__main__":
    main()
