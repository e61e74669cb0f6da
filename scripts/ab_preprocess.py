"""In-process A/B: f32-pack vs bf16-early-normalize grid preprocessing.

Separate-process timings through the relay vary ±20%, so both variants run
interleaved in ONE process (jit caches cleared between variants; the env
knob is read at trace time).

    python scripts/ab_preprocess.py --batches 1,16 --reps 3
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,16")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    import tstar_tpu.parallel.batched as pb
    import tstar_tpu.search.engine as eng
    from tstar_tpu.search.detector_scorer import OwlVitScorer, make_owlvit_scorer
    from tstar_tpu.search.state import init_state
    from tstar_tpu.utils.config import SearchConfig

    n_valid = 1024
    cfg = SearchConfig(
        search_budget=1.0, confidence_threshold=2.0,
        detector_threshold=10.0, use_pallas_preprocess=False, verify_batch=4,
    )
    n_pad = cfg.padded_frames(n_valid)
    iters = cfg.iteration_cap(n_valid)
    frames_scored = iters * cfg.frames_per_iteration

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

    def mk_scorer():
        c = rng.integers(0, 256, (n_pad, *cfg.cache_hw, 3), dtype=np.uint8)
        c[n_valid:] = 0
        return make_owlvit_scorer(
            model, variables, jnp.asarray(c),
            ["target"], ["cue one", "cue two"], tok, cfg,
        )

    def clear():
        eng._masked_step_jit.clear_cache()
        eng._pop_jit.clear_cache()
        pb._batched_step_jit.clear_cache()
        pb._batched_pop_jit.clear_cache()

    def run_b(B):
        if B == 1:
            scorer = mk_scorer()
            state = init_state(n_valid, 1, cfg, jax.random.key(1), n_pad=n_pad)

            def run():
                _, secs = eng.run_search_chained(state, scorer, cfg)
                np.asarray(secs)
        else:
            scorers = [mk_scorer() for _ in range(B)]
            bsc = OwlVitScorer(
                cache=jnp.stack([s.cache for s in scorers]),
                variables=variables,
                query_embeds=jnp.stack([s.query_embeds for s in scorers]),
                query_mask=jnp.stack([s.query_mask for s in scorers]),
                class_weights=jnp.stack([s.class_weights for s in scorers]),
                model=model,
                config=cfg,
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

    for B in [int(b) for b in args.batches.split(",")]:
        results = {"f32_pack": [], "bf16_early": []}
        runner = run_b(B)
        for rep in range(args.reps):
            for label, env in (("f32_pack", "1"), ("bf16_early", "")):
                os.environ["TSTAR_PREPROCESS_F32_PACK"] = env
                clear()
                runner()  # compile (env read at trace time)
                t0 = time.perf_counter()
                runner()
                dt = time.perf_counter() - t0
                results[label].append(B * frames_scored / dt)
        for label, fps in results.items():
            print(f"B={B} {label}: {[round(f, 1) for f in fps]} "
                  f"best={max(fps):.1f}", flush=True)


if __name__ == "__main__":
    main()
