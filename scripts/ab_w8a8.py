"""In-process A/B: fused quantize->int8-matmul kernel vs XLA's staging.

The int8 step trace (PERFORMANCE.md "int8's ceiling, quantified") showed
~74% of the int8 verify forward in non-dense work dominated by
activation-quantization staging (f32 scaled activations materialized in
HBM before each int8 dot).  kernels/quant_matmul.py quantizes in VMEM;
this measures the e2e effect on the int8 knob's home regime — the
worst-case B=1 search (verification fires every step, detector_quant
int8).  Interleaved in one process (TSTAR_W8A8_KERNEL read at trace time).

    python scripts/ab_w8a8.py --reps 3
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batches", default="1")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    import tstar_tpu.search.engine as eng
    from tstar_tpu.search.detector_scorer import make_owlvit_scorer
    from tstar_tpu.search.state import init_state
    from tstar_tpu.utils.config import SearchConfig

    n_valid = 1024
    cfg = SearchConfig(
        search_budget=1.0, confidence_threshold=2.0,
        detector_threshold=0.005,          # worst case: verify every step
        use_pallas_preprocess=False, verify_batch=4,
        detector_quant="int8",
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
    c = rng.integers(0, 256, (n_pad, *cfg.cache_hw, 3), dtype=np.uint8)
    c[n_valid:] = 0

    scorer = make_owlvit_scorer(
        model, variables, jnp.asarray(c),
        ["target"], ["cue one", "cue two"], tok, cfg,
    )
    assert scorer.qvision is not None, "int8 tower missing"
    state = init_state(n_valid, 1, cfg, jax.random.key(1), n_pad=n_pad)

    def clear():
        eng._masked_step_jit.clear_cache()
        eng._pop_jit.clear_cache()

    def run():
        _, secs = eng.run_search_chained(state, scorer, cfg)
        np.asarray(secs)

    results = {"w8a8_kernel": [], "xla_staging": []}
    for rep in range(args.reps):
        for label, env in (("w8a8_kernel", "1"), ("xla_staging", "0")):
            os.environ["TSTAR_W8A8_KERNEL"] = env
            clear()
            run()   # compile (env read at trace time)
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            results[label].append(frames_scored / dt)
    for label, fps in results.items():
        print(f"B=1 worst int8 {label}: {[round(f, 1) for f in fps]} "
              f"best={max(fps):.1f}", flush=True)


if __name__ == "__main__":
    main()
