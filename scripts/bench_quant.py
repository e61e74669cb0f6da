"""On-chip A/B: int8-quantized vs bf16 detector in the worst-case search,
plus a verify_batch bucket-size sweep.

Timing uses dependent chains ending in a host fetch (the only reliable
fence through the attachment — see CLAUDE.md).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    from tstar_tpu.search.detector_scorer import make_owlvit_scorer
    from tstar_tpu.search.engine import run_search_chained
    from tstar_tpu.search.state import init_state
    from tstar_tpu.utils.config import SearchConfig

    n_valid = 1024
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
    cache_np = rng.integers(0, 256, size=(n_pad, *base.cache_hw, 3), dtype=np.uint8)
    cache_np[n_valid:] = 0
    cache = jnp.asarray(cache_np)

    def measure(cfg, reps=3):
        scorer = make_owlvit_scorer(
            model, variables, cache, ["target"], ["cue one", "cue two"], tok, cfg
        )
        state = init_state(n_valid, 1, cfg, jax.random.key(1), n_pad=n_pad)

        def run():
            final, secs = run_search_chained(state, scorer, cfg)
            np.asarray(secs)  # host fetch fence

        run()  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return frames_scored / best

    report = {}
    # verify_batch sweep at bf16
    for vb in (2, 4, 8, None):
        cfg = dataclasses.replace(base, verify_batch=vb)
        report[f"bf16_vb{vb}"] = round(measure(cfg), 2)
        print(f"bf16 verify_batch={vb}: {report[f'bf16_vb{vb}']} f/s", flush=True)

    # int8 at the same sweep points
    for vb in (2, 4, 8, None):
        cfg = dataclasses.replace(base, verify_batch=vb, detector_quant="int8")
        report[f"int8_vb{vb}"] = round(measure(cfg), 2)
        print(f"int8 verify_batch={vb}: {report[f'int8_vb{vb}']} f/s", flush=True)

    # no-verify (sparse regime) int8 vs bf16
    for quant in (None, "int8"):
        cfg = dataclasses.replace(base, detector_threshold=10.0,
                                  detector_quant=quant, verify_batch=4)
        key = "sparse_" + (quant or "bf16")
        report[key] = round(measure(cfg), 2)
        print(f"{key}: {report[key]} f/s", flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
