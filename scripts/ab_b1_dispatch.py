"""A/B: single-dispatch while_loop vs host-chained steps, SPARSE regime, B=1.

VERDICT r3 item 3.  The B=1 no-verify search is dispatch-bound through the
axon relay (BENCH_r03 recorded 8.4k f/s but identical code measured
2.5-8.6k across runs).  The r2 while_loop-vs-chained A/B was only ever run
in the compute-bound worst case (equal at 1.52 s), where dispatch fully
overlaps the 17 detector forwards per step.  In the sparse regime each step
is ONE ~1 ms grid forward, so the per-step dispatch round-trip can bind —
exactly the host-loop overhead class this framework exists to delete
(reference ``TStar/interface_searcher.py:444-491`` pays a full host
round-trip per iteration).

This script interleaves the two drivers pairwise (each repeat times chained
then while_loop back-to-back, so tunnel-contention noise hits both sides of
a pair equally) and reports per-repeat samples + medians + spread.

Run on the real chip (background shell; first compile of both forms
~3-6 min):
    python scripts/ab_b1_dispatch.py [--reps 7] [--worst_case]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--n_valid", type=int, default=1024)
    ap.add_argument("--worst_case", action="store_true",
                    help="also A/B the verification-heavy worst case")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    from tstar_tpu.search.detector_scorer import make_owlvit_scorer
    from tstar_tpu.search.engine import run_search, run_search_chained
    from tstar_tpu.search.state import init_state
    from tstar_tpu.utils.config import SearchConfig

    n_valid = args.n_valid
    model_cfg = owlvit_base_patch32()
    model = OwlViTDetector(model_cfg, dtype=jnp.bfloat16)
    size = model_cfg.vision.image_size
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, size, size, 3), jnp.bfloat16),
        jnp.zeros((2, model_cfg.text.max_length), jnp.int32),
    )
    tok = HashTokenizer(vocab_size=model_cfg.text.vocab_size,
                        context=model_cfg.text.max_length)
    rng = np.random.default_rng(0)

    # run_search must live inside a jit; scorer/state stay ARGUMENTS so the
    # frame cache / weights don't become HLO constants (CLAUDE.md relay 413).
    run_search_jit = jax.jit(run_search, static_argnums=2)

    out = {"device_kind": getattr(jax.devices()[0], "device_kind", "?")}

    def ab(tag, cfg):
        n_pad = cfg.padded_frames(n_valid)
        iters = cfg.iteration_cap(n_valid)
        frames_scored = iters * cfg.frames_per_iteration
        c_np = rng.integers(0, 256, (n_pad, *cfg.cache_hw, 3), dtype=np.uint8)
        c_np[n_valid:] = 0
        scorer = make_owlvit_scorer(
            model, variables, jnp.asarray(c_np),
            ["target"], ["cue one", "cue two"], tok, cfg,
        )
        state = init_state(n_valid, 1, cfg, jax.random.key(1), n_pad=n_pad)

        def chained():
            _, secs = run_search_chained(state, scorer, cfg)
            np.asarray(secs)        # host fetch: the only reliable fence

        def while_loop():
            _, secs = run_search_jit(state, scorer, cfg)
            np.asarray(secs)

        chained()                   # compile both forms before timing
        while_loop()
        cs, ws = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter(); chained()
            cs.append(frames_scored / (time.perf_counter() - t0))
            t0 = time.perf_counter(); while_loop()
            ws.append(frames_scored / (time.perf_counter() - t0))
        for name, xs in (("chained", cs), ("while_loop", ws)):
            out[f"{tag}_{name}"] = {
                "median_fps": round(float(np.median(xs)), 1),
                "min_fps": round(min(xs), 1),
                "max_fps": round(max(xs), 1),
                "samples": [round(x, 1) for x in xs],
            }
        print(f"{tag}: chained median {np.median(cs):.0f} "
              f"[{min(cs):.0f}-{max(cs):.0f}], while_loop median "
              f"{np.median(ws):.0f} [{min(ws):.0f}-{max(ws):.0f}]", flush=True)

    # sparse regime: detector_threshold 10 empties the keep mask, the
    # verification branch never fires — one grid forward per step.
    ab("sparse", SearchConfig(
        search_budget=1.0, confidence_threshold=2.0, detector_threshold=10.0,
        use_pallas_preprocess=False, verify_batch=4,
    ))
    if args.worst_case:
        ab("worst", SearchConfig(
            search_budget=1.0, confidence_threshold=2.0,
            use_pallas_preprocess=False, verify_batch=4,
        ))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
