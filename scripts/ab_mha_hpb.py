"""In-process A/B: fused-MHA heads-per-program (TSTAR_MHA_HPB) sweep.

The r4 B=16 trace shows the fused MHA custom-calls at ~3.6 ms/step while
their pure-MXU attention FLOPs are ~1 ms — the gap is the VPU softmax over
the (S, S) tile plus intra-program serialization (QK^T -> softmax -> AV per
head).  Heads-per-program is the cheapest scheduling lever: more heads per
program give Mosaic head-level MXU/VPU overlap (head i+1's QK^T is
independent of head i's softmax) and fewer grid iterations; numerics are
bit-identical.  Same interleaved one-process methodology as
ab_attention.py (separate-process relay timings vary +-20-45%).

    python scripts/ab_mha_hpb.py --mode sparse --batches 16 --hpbs 2,4,6,12
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mode", choices=("sparse", "worst"), default="sparse")
    ap.add_argument("--hpbs", default="2,4,6,12",
                    help="env values to interleave")
    ap.add_argument("--env_var", default="TSTAR_MHA_HPB",
                    help="trace-time env var to sweep (e.g. TSTAR_MHA_P16)")
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
        detector_threshold=10.0 if args.mode == "sparse" else 0.005,
        use_pallas_preprocess=False, verify_batch=4,
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

    base = make_owlvit_scorer(
        model, variables,
        jnp.zeros((n_pad, *cfg.cache_hw, 3), jnp.uint8),
        ["target"], ["cue one", "cue two"], tok, cfg,
    )

    import dataclasses

    def clear():
        eng._masked_step_jit.clear_cache()
        eng._pop_jit.clear_cache()
        pb._batched_step_jit.clear_cache()
        pb._batched_pop_jit.clear_cache()
        from tstar_tpu.kernels.attention import fused_mha_from_qkv
        fused_mha_from_qkv.clear_cache()

    def run_b(B):
        c = rng.integers(0, 256, (B, n_pad, *cfg.cache_hw, 3), dtype=np.uint8)
        c[:, n_valid:] = 0
        bsc = dataclasses.replace(
            base,
            cache=jnp.asarray(c),
            query_embeds=jnp.stack([base.query_embeds] * B),
            query_mask=jnp.stack([base.query_mask] * B),
            class_weights=jnp.stack([base.class_weights] * B),
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

    hpbs = [h for h in args.hpbs.split(",")]
    for B in [int(b) for b in args.batches.split(",")]:
        results = {h: [] for h in hpbs}
        runner = run_b(B)
        for rep in range(args.reps):
            for h in hpbs:
                os.environ[args.env_var] = h
                clear()
                runner()  # compile (env read at trace time)
                t0 = time.perf_counter()
                runner()
                dt = time.perf_counter() - t0
                fps = B * frames_scored / dt
                results[h].append(fps)
                # incremental: a crashed later arm (e.g. a VMEM-OOM hpb)
                # must not lose the completed measurements
                print(f"  rep{rep} B={B} {args.env_var}={h}: {fps:.1f}",
                      flush=True)
        os.environ.pop(args.env_var, None)
        for h, fps in results.items():
            print(f"B={B} {args.mode} {args.env_var}={h}: "
                  f"{[round(f, 1) for f in fps]} best={max(fps):.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
