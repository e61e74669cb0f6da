"""On-chip A/B: bf16 vs int8 (W8A8) vs w8a16 (weight-only int8) detector.

VERDICT r4 item 5: the r3 ceiling analysis showed ~74% of the W8A8 step cost
is dynamic activation-quant STAGING traffic (PERFORMANCE.md "int8's
ceiling"); weight-only quantization has no act staging — weights load int8
(half the HBM bytes of bf16) and dequantize into the matmul.  This sweeps
both regimes at B=1/8/24:

  * worst-case (confidence_threshold=2.0, default detector_threshold):
    verification fires every step, 17 detector forwards/step;
  * sparse (detector_threshold=10.0): no verification, one grid forward —
    the regime the r3 dissection proved is encoder MEMORY traffic, i.e.
    exactly where halved weight bytes should show up.

Run on the real chip (background shell; ~15 configs x 1-4 min compile):
    python scripts/ab_w8a16.py [--batches 1,8,24] [--quants bf16,int8,w8a16]

Prints one JSON line (side artifact, not the driver's bench.py contract).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,24")
    ap.add_argument("--quants", default="bf16,int8,w8a16")
    ap.add_argument("--regimes", default="worst,sparse")
    ap.add_argument("--n_valid", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    from tstar_tpu.parallel.batched import run_search_batched_chained
    from tstar_tpu.search.detector_scorer import OwlVitScorer, make_owlvit_scorer
    from tstar_tpu.search.engine import run_search_chained
    from tstar_tpu.search.state import init_state
    from tstar_tpu.utils.config import SearchConfig

    n_valid = args.n_valid
    base = SearchConfig(search_budget=1.0, confidence_threshold=2.0,
                        use_pallas_preprocess=False)
    n_pad = base.padded_frames(n_valid)
    iters = base.iteration_cap(n_valid)
    frames_scored = iters * base.frames_per_iteration

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
    cache_np = rng.integers(0, 256, (n_pad, *base.cache_hw, 3), dtype=np.uint8)
    cache_np[n_valid:] = 0
    cache = jnp.asarray(cache_np)

    def time_best_of(fn, n=args.reps):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    batches = [int(b) for b in args.batches.split(",")]
    quants = [q if q != "bf16" else None for q in args.quants.split(",")]
    regimes = args.regimes.split(",")
    big_cache = {}  # B -> (B, n_pad, h, w, 3) device cache, shared by configs

    out = {}
    for regime in regimes:
        for quant in quants:
            cfg = dataclasses.replace(
                base,
                detector_quant=quant,
                detector_threshold=10.0 if regime == "sparse" else
                base.detector_threshold,
            )
            scorer = make_owlvit_scorer(
                model, variables, cache,
                ["target"], ["cue one", "cue two"], tok, cfg,
            )
            for B in batches:
                if regime == "worst" and B > 8:
                    continue    # worst-case ladder tops out at B=8 (bench.py)
                label = f"{regime}_{quant or 'bf16'}_b{B}"
                try:
                    if B == 1:
                        state = init_state(n_valid, 1, cfg, jax.random.key(1),
                                           n_pad=n_pad)

                        def run(state=state, scorer=scorer, cfg=cfg):
                            _, secs = run_search_chained(state, scorer, cfg)
                            np.asarray(secs)   # host-fetch fence (CLAUDE.md)
                    else:
                        if B not in big_cache:
                            c_np = rng.integers(
                                0, 256, (B, n_pad, *cfg.cache_hw, 3),
                                dtype=np.uint8,
                            )
                            c_np[:, n_valid:] = 0
                            big_cache[B] = jnp.asarray(c_np)
                            del c_np
                        bsc = OwlVitScorer(
                            cache=big_cache[B],
                            variables=variables,
                            query_embeds=jnp.stack([scorer.query_embeds] * B),
                            query_mask=jnp.stack([scorer.query_mask] * B),
                            class_weights=jnp.stack([scorer.class_weights] * B),
                            model=model,
                            config=cfg,
                            qvision=scorer.qvision,
                        )
                        stacked = jax.tree_util.tree_map(
                            lambda *xs: jnp.stack(xs),
                            *[init_state(n_valid, 1, cfg,
                                         jax.random.key(200 + i), n_pad=n_pad)
                              for i in range(B)],
                        )

                        def run(bsc=bsc, stacked=stacked, cfg=cfg):
                            _, secs = run_search_batched_chained(
                                stacked, bsc, cfg, max_iterations=iters
                            )
                            np.asarray(secs)

                    run()   # compile
                    fps = B * frames_scored / time_best_of(run)
                    out[label] = round(fps, 2)
                    print(f"{label}: {out[label]} f/s", flush=True)
                except Exception as e:   # shared-tenancy HBM pressure
                    if ("RESOURCE_EXHAUSTED" not in repr(e)
                            and "ResourceExhausted" not in repr(e)):
                        raise
                    out[label] = None
                    print(f"{label}: OOM-skipped", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
