"""In-process A/B: verify bucket width in the BATCHED worst-case search.

Companion to ab_verify_width.py (single-video): the batched path pools
verification candidates globally across videos, so bucket width sets the
width of each global rescore forward.  Measures the bench headline config
(B videos, verification fires every step) at widths 4 vs 16 under the
full r3 kernel suite.

    python scripts/ab_verify_width_batched.py --batch 8 --reps 2
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--widths", default="4,16")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    import tstar_tpu.parallel.batched as pb
    from tstar_tpu.search.detector_scorer import OwlVitScorer, make_owlvit_scorer
    from tstar_tpu.search.state import init_state
    from tstar_tpu.utils.config import SearchConfig

    B = args.batch
    n_valid = 1024
    base_cfg = SearchConfig(
        search_budget=1.0, confidence_threshold=2.0,
        detector_threshold=0.005, use_pallas_preprocess=False,
    )
    n_pad = base_cfg.padded_frames(n_valid)
    iters = base_cfg.iteration_cap(n_valid)
    frames_scored = iters * base_cfg.frames_per_iteration

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
    base = make_owlvit_scorer(
        model, variables, jnp.zeros((n_pad, *base_cfg.cache_hw, 3), jnp.uint8),
        ["target"], ["cue one", "cue two"], tok, base_cfg,
    )
    rng = np.random.default_rng(0)
    c = rng.integers(0, 256, (B, n_pad, *base_cfg.cache_hw, 3), dtype=np.uint8)
    c[:, n_valid:] = 0
    cache = jnp.asarray(c)

    def clear():
        pb._batched_step_jit.clear_cache()
        pb._batched_pop_jit.clear_cache()

    def make_runner(width):
        cfg = dataclasses.replace(base_cfg, verify_batch=width)
        bsc = OwlVitScorer(
            cache=cache, variables=variables,
            query_embeds=jnp.stack([base.query_embeds] * B),
            query_mask=jnp.stack([base.query_mask] * B),
            class_weights=jnp.stack([base.class_weights] * B),
            model=model, config=cfg,
        )
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[init_state(n_valid, 1, cfg, jax.random.key(200 + i),
                         n_pad=n_pad) for i in range(B)],
        )

        def run():
            _, secs = pb.run_search_batched_chained(
                stacked, bsc, cfg, max_iterations=iters
            )
            np.asarray(secs)

        return run

    widths = [int(w) for w in args.widths.split(",")]
    runners = {w: make_runner(w) for w in widths}
    results = {w: [] for w in widths}
    for rep in range(args.reps):
        for w in widths:
            clear()
            runners[w]()
            t0 = time.perf_counter()
            runners[w]()
            dt = time.perf_counter() - t0
            results[w].append(B * frames_scored / dt)
    for w, fps in results.items():
        print(f"B={B} worst vb{w}: {[round(f, 1) for f in fps]} "
              f"best={max(fps):.1f}", flush=True)


if __name__ == "__main__":
    main()
