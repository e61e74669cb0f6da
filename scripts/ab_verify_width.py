"""In-process A/B: verification bucket width under the fused Pallas MHA.

r2 measured 4-image verify forwards as the MXU sweet spot (8/16-wide
worse) — but that was under XLA attention, whose materialized f32 probs
traffic grows with the image batch.  The r3 fused MHA kernel
(kernels/attention.py, auto-gated at batch >= 8) removes exactly that
traffic, so wide verify forwards route through the kernel and may now win.
This sweeps ``verify_batch`` in the worst-case B=1 search (verification
fires every step — the bench headline config), interleaved in one process
(the only trustworthy comparison through the shared-tunnel relay).

    python scripts/ab_verify_width.py --widths 4,8,16 --reps 2
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="4,8,16")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--control", action="store_true",
                    help="also run each width with TSTAR_FUSED_MHA=0")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    import tstar_tpu.search.engine as eng
    from tstar_tpu.search.detector_scorer import OwlVitScorer, make_owlvit_scorer
    from tstar_tpu.search.state import init_state
    from tstar_tpu.utils.config import SearchConfig

    n_valid = 1024
    base_cfg = SearchConfig(
        search_budget=1.0, confidence_threshold=2.0,
        detector_threshold=0.005,          # worst case: verify every step
        use_pallas_preprocess=False, verify_batch=4,
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
    rng = np.random.default_rng(0)
    c = rng.integers(0, 256, (n_pad, *base_cfg.cache_hw, 3), dtype=np.uint8)
    c[n_valid:] = 0
    cache = jnp.asarray(c)

    base_scorer = make_owlvit_scorer(
        model, variables, cache, ["target"], ["cue one", "cue two"], tok,
        base_cfg,
    )

    def clear():
        eng._masked_step_jit.clear_cache()
        eng._pop_jit.clear_cache()

    def make_runner(width):
        cfg = dataclasses.replace(base_cfg, verify_batch=width)
        scorer = OwlVitScorer(
            cache=cache, variables=variables,
            query_embeds=base_scorer.query_embeds,
            query_mask=base_scorer.query_mask,
            class_weights=base_scorer.class_weights,
            model=model, config=cfg,
        )
        state = init_state(n_valid, 1, cfg, jax.random.key(1), n_pad=n_pad)

        def run():
            _, secs = eng.run_search_chained(state, scorer, cfg)
            np.asarray(secs)

        return run

    widths = [int(w) for w in args.widths.split(",")]
    variants = [(f"vb{w}_fused", w, "1") for w in widths]
    if args.control:
        variants += [(f"vb{w}_xla", w, "0") for w in widths if w >= 8]
    results = {label: [] for label, _, _ in variants}
    runners = {w: make_runner(w) for w in widths}
    for rep in range(args.reps):
        for label, w, env in variants:
            os.environ["TSTAR_FUSED_MHA"] = env
            clear()
            runners[w]()  # compile (env read at trace time)
            t0 = time.perf_counter()
            runners[w]()
            dt = time.perf_counter() - t0
            results[label].append(frames_scored / dt)
    for label, fps in results.items():
        print(f"B=1 worst {label}: {[round(f, 1) for f in fps]} "
              f"best={max(fps):.1f}", flush=True)


if __name__ == "__main__":
    main()
