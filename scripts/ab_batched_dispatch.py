"""A/B: one-jit while_loop vs host-chained steps for the BATCHED search.

Round-5 follow-up to the B=1 result (PERFORMANCE.md "B=1 dispatch bound,
closed (r4)"): routing the single-video sparse search through ONE jitted
``run_search`` while_loop beat the per-step-dispatch chain by +53% and
collapsed its ±35% tenancy spread to ±2%.  The batched drivers
(``parallel/batched.py``) still default to the chained form on r2-era
evidence measured only in the compute-bound worst case — but the r5
roofline (scripts/roofline_sparse.py) puts the measured B=24 sparse step
BELOW even the zero-overlap serial bound, which smells like per-step
host-dispatch overhead through the axon relay, not device time.

This interleaves ``run_search_batched_chained`` against a jitted
``run_search_batched`` (scorer passed as a jit ARGUMENT — the frame caches
must not become HLO constants, CLAUDE.md relay 413) pairwise at B in
{8, 24}, sparse regime, and checks the two forms' keyframes are identical.

Run on the real chip (background shell; first compiles ~4-8 min):
    python scripts/ab_batched_dispatch.py [--reps 5] [--batches 8,24]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n_valid", type=int, default=1024)
    ap.add_argument("--batches", default="8,24")
    ap.add_argument("--worst_case", action="store_true",
                    help="also A/B the verification-heavy worst case at B=8")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    from tstar_tpu.parallel.batched import (
        run_search_batched,
        run_search_batched_chained,
    )
    from tstar_tpu.search.detector_scorer import OwlVitScorer, make_owlvit_scorer
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

    run_batched_jit = jax.jit(run_search_batched, static_argnums=2)

    out = {"device_kind": getattr(jax.devices()[0], "device_kind", "?")}

    def ab(tag, B, cfg):
        n_pad = cfg.padded_frames(n_valid)
        iters = cfg.iteration_cap(n_valid)
        frames_scored = B * iters * cfg.frames_per_iteration
        base = make_owlvit_scorer(
            model, variables,
            jnp.zeros((n_pad, *cfg.cache_hw, 3), jnp.uint8),
            ["target"], ["cue one", "cue two"], tok, cfg,
        )
        c_np = rng.integers(0, 256, (B, n_pad, *cfg.cache_hw, 3), dtype=np.uint8)
        c_np[:, n_valid:] = 0
        bsc = OwlVitScorer(
            cache=jnp.asarray(c_np),
            variables=variables,
            query_embeds=jnp.stack([base.query_embeds] * B),
            query_mask=jnp.stack([base.query_mask] * B),
            class_weights=jnp.stack([base.class_weights] * B),
            model=model,
            config=cfg,
        )
        del c_np
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[init_state(n_valid, 1, cfg, jax.random.key(300 + i), n_pad=n_pad)
              for i in range(B)],
        )

        def chained():
            _, secs = run_search_batched_chained(
                stacked, bsc, cfg, max_iterations=iters
            )
            return np.asarray(secs)   # host fetch: the only reliable fence

        def while_loop():
            _, secs = run_batched_jit(stacked, bsc, cfg)
            return np.asarray(secs)

        sc = chained()                # compile both forms before timing
        sw = while_loop()
        if not np.array_equal(sc, sw):
            out[f"{tag}_b{B}_MISMATCH"] = {
                "chained": sc.tolist(), "while_loop": sw.tolist(),
            }
            print(f"{tag} B={B}: KEYFRAME MISMATCH between drivers", flush=True)
        cs, ws = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter(); chained()
            cs.append(frames_scored / (time.perf_counter() - t0))
            t0 = time.perf_counter(); while_loop()
            ws.append(frames_scored / (time.perf_counter() - t0))
        for name, xs in (("chained", cs), ("while_loop", ws)):
            out[f"{tag}_b{B}_{name}"] = {
                "median_fps": round(float(np.median(xs)), 1),
                "min_fps": round(min(xs), 1),
                "max_fps": round(max(xs), 1),
                "samples": [round(x, 1) for x in xs],
            }
        print(f"{tag} B={B}: chained median {np.median(cs):.0f} "
              f"[{min(cs):.0f}-{max(cs):.0f}], while_loop median "
              f"{np.median(ws):.0f} [{min(ws):.0f}-{max(ws):.0f}]", flush=True)

    sparse = SearchConfig(
        search_budget=1.0, confidence_threshold=2.0, detector_threshold=10.0,
        use_pallas_preprocess=False, verify_batch=4,
    )
    for B in [int(b) for b in args.batches.split(",") if b]:
        ab("sparse", B, sparse)
    if args.worst_case:
        ab("worst", 8, SearchConfig(
            search_budget=1.0, confidence_threshold=2.0,
            use_pallas_preprocess=False, verify_batch=4,
        ))

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
