"""Break down where T* search-step time goes on the attached chip.

WARNING (r2 finding, see CLAUDE.md): through the axon relay,
``jax.block_until_ready`` can return before execution completes and
independent same-argument calls appear memoized — ONLY dependent chains
ending in a host fetch measure truthfully.  The "chain" sections at the
bottom are the trustworthy numbers; the per-op sections are kept for the
dispatch-latency floor they reveal, not for op cost.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=20, reps=3):
    import jax

    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from tstar_tpu.models.clip_tokenizer import HashTokenizer
    from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32
    from tstar_tpu.search.detector_scorer import make_owlvit_scorer
    from tstar_tpu.search.engine import search_step
    from tstar_tpu.search.state import init_state
    from tstar_tpu.parallel.batched import batched_search_step
    from tstar_tpu.utils.config import SearchConfig
    from tstar_tpu.kernels.image import build_detector_grid
    from tstar_tpu.ops.smoother import smoothing_spline_distribution
    import dataclasses

    n_valid = 1024
    cfg = SearchConfig(search_budget=1.0, confidence_threshold=2.0,
                       use_pallas_preprocess=False)
    n_pad = cfg.padded_frames(n_valid)
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
    cache = jnp.asarray(rng.integers(0, 256, (n_pad, *cfg.cache_hw, 3), dtype=np.uint8))
    scorer = make_owlvit_scorer(model, variables, cache, ["t"], ["c1", "c2"], tok, cfg)
    state = init_state(n_valid, 1, cfg, jax.random.key(1), n_pad=n_pad)

    report = {}

    # 0. dispatch latency: trivial jitted op chained
    @jax.jit
    def triv(x):
        return x + 1.0

    x0 = jnp.zeros((8, 128))
    report["dispatch_chain_ms"] = timeit(lambda: triv(x0))

    # 1. detector forward alone, B grids
    @jax.jit
    def fwd(vars_, px, qe, qm):
        feats = model.apply(vars_, px, method=OwlViTDetector.encode_image)
        return model.apply(vars_, feats, qe, qm, method=OwlViTDetector.predict)

    for B in (1, 8):
        px = jnp.zeros((B, size, size, 3), jnp.bfloat16)
        report[f"detector_fwd_B{B}_ms"] = timeit(
            lambda: fwd(variables, px, scorer.query_embeds, scorer.query_mask)
        )

    # 2. grid preprocessing alone
    secs = jnp.arange(16, dtype=jnp.int32) * 7

    @jax.jit
    def prep(c, s):
        return build_detector_grid(c, s, (4, 4), size, dtype=jnp.bfloat16)

    report["grid_preprocess_ms"] = timeit(lambda: prep(cache, secs))

    try:
        from tstar_tpu.kernels.pallas_grid import build_detector_grid_pallas

        @jax.jit
        def prep_pl(c, s):
            return build_detector_grid_pallas(c, s, (4, 4), size, dtype=jnp.bfloat16)

        report["grid_preprocess_pallas_ms"] = timeit(lambda: prep_pl(cache, secs))
    except Exception as e:  # noqa: BLE001
        report["grid_preprocess_pallas_ms"] = f"failed: {e}"

    # 3. smoother alone
    scores = jnp.abs(jax.random.normal(jax.random.key(2), (n_pad,)))
    visited = jnp.zeros((n_pad,), bool).at[::7].set(True)
    valid = jnp.arange(n_pad) < n_valid

    @jax.jit
    def smoo(s, v, va):
        return smoothing_spline_distribution(s, v, va, jnp.asarray(n_valid))

    report["smoother_ms"] = timeit(lambda: smoo(scores, visited, valid))

    # 4. full single search_step
    step = jax.jit(search_step, static_argnums=(2, 3))

    def one_step():
        s2, _ = step(state, scorer, cfg, False)
        return s2.scores

    report["search_step_B1_ms"] = timeit(one_step)

    # 5. batched step at B=8
    scorers = [
        make_owlvit_scorer(
            model, variables,
            jnp.asarray(rng.integers(0, 256, (n_pad, *cfg.cache_hw, 3), dtype=np.uint8)),
            ["t"], ["c1", "c2"], tok, cfg,
        )
        for _ in range(8)
    ]
    from tstar_tpu.search.detector_scorer import OwlVitScorer
    bsc = OwlVitScorer(
        cache=jnp.stack([s.cache for s in scorers]),
        variables=variables,
        query_embeds=jnp.stack([s.query_embeds for s in scorers]),
        query_mask=jnp.stack([s.query_mask for s in scorers]),
        class_weights=jnp.stack([s.class_weights for s in scorers]),
        model=model, config=cfg,
    )
    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[init_state(n_valid, 1, cfg, jax.random.key(10 + i), n_pad=n_pad)
          for i in range(8)],
    )
    bstep = jax.jit(batched_search_step, static_argnums=2)

    def one_bstep():
        s2 = bstep(states, bsc, cfg)
        return s2.scores

    report["batched_step_B8_ms"] = timeit(one_bstep, n=10)

    # 6. verify rescore alone (16 full-size frames = 16x the grid compute)
    @jax.jit
    def ver(sc, s):
        return sc.score_verify(s)

    report["score_verify_16_ms"] = timeit(lambda: ver(scorer, secs))

    # 7. dependent chain of masked steps (what run_search_chained runs)
    from tstar_tpu.search.engine import masked_search_step

    mstep = jax.jit(masked_search_step, static_argnums=2)

    def chain(n_steps):
        s = state
        for _ in range(n_steps):
            s = mstep(s, scorer, cfg)
        return s.scores

    jax.block_until_ready(chain(2))  # compile
    for n_steps in (8, 63):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(n_steps))
        report[f"masked_chain_{n_steps}_ms_per_step"] = (
            (time.perf_counter() - t0) / n_steps * 1e3
        )

    # 8. dependent chain of plain search_steps (no cond wrapper)
    def chain_plain(n_steps):
        s = state
        for _ in range(n_steps):
            s, _ = step(s, scorer, cfg, False)
        return s.scores

    jax.block_until_ready(chain_plain(2))
    t0 = time.perf_counter()
    jax.block_until_ready(chain_plain(63))
    report["plain_chain_63_ms_per_step"] = (time.perf_counter() - t0) / 63 * 1e3

    # 9. dependent chain of batched masked steps at B=8
    def chain_b(n_steps):
        s = states
        for _ in range(n_steps):
            s = bstep(s, bsc, cfg)
        return s.scores

    jax.block_until_ready(chain_b(2))
    t0 = time.perf_counter()
    jax.block_until_ready(chain_b(32))
    report["batched_chain_32_ms_per_step"] = (time.perf_counter() - t0) / 32 * 1e3

    for k, v in report.items():
        print(f"{k}: {v if isinstance(v, str) else round(v, 3)}")


if __name__ == "__main__":
    main()
