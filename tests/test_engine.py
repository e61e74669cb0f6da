"""Seed-for-seed equivalence of the JAX search engine vs the NumPy oracle.

The oracle (tests/oracle.py) re-derives the reference search semantics
sequentially in float32; both implementations consume identical Gumbel noise
(same jax.random key schedule), so every sampled index, visited mask, window
splat, verification decision, and the final keyframe set must agree.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.ops.smoother import smoothing_spline_distribution
from tstar_tpu.search.engine import run_search, run_search_with_history, search_step
from tstar_tpu.search.scorers import TableScorer
from tstar_tpu.search.state import init_state
from tstar_tpu.utils.config import SearchConfig

from tests.oracle import OracleTables, make_synthetic_tables, run_oracle


class _KeySchedule:
    """Replicate the engine's RNG consumption: one split per step, one for pop."""

    def __init__(self, seed: int, n_pad: int):
        self.rng = jax.random.key(seed)
        self.n_pad = n_pad

    def gumbel(self, _iteration: int) -> np.ndarray:
        self.rng, k = jax.random.split(self.rng)
        return np.asarray(jax.random.gumbel(k, (self.n_pad,), jnp.float32))

    def pop_gumbel(self) -> np.ndarray:
        self.rng, k = jax.random.split(self.rng)
        return np.asarray(jax.random.gumbel(k, (self.n_pad,), jnp.float32))


def _smoother_adapter(n_pad):
    valid_template = jnp.arange(n_pad)

    def fn(scores, visited, n_valid):
        return np.asarray(
            smoothing_spline_distribution(
                jnp.asarray(scores),
                jnp.asarray(visited),
                valid_template < n_valid,
                jnp.asarray(n_valid),
            )
        )

    return fn


def _run_both(n_valid, n_targets, seed, config, tables=None):
    n_pad = config.padded_frames(n_valid)
    if tables is None:
        tables = make_synthetic_tables(
            n_pad, n_valid, config.max_objects, n_targets, seed=seed + 1000
        )
    scorer = TableScorer(
        grid_conf=jnp.asarray(tables.grid_conf),
        grid_presence=jnp.asarray(tables.grid_presence),
        verify_conf=jnp.asarray(tables.verify_conf),
        verify_presence=jnp.asarray(tables.verify_presence),
    )
    state = init_state(n_valid, n_targets, config, jax.random.key(seed), n_pad=n_pad)
    final, secs, history = run_search_with_history(state, scorer, config)

    sched = _KeySchedule(seed, n_pad)
    oracle = run_oracle(
        n_valid,
        n_targets,
        tables,
        config,
        gumbel_fn=sched.gumbel,
        pop_gumbel_fn=sched.pop_gumbel,
        smoother_fn=_smoother_adapter(n_pad),
    )
    return final, np.asarray(secs), history, oracle


CFG = SearchConfig(search_budget=1.0, confidence_threshold=0.6)


class TestEngineOracleEquivalence:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_full_search_matches(self, seed):
        final, secs, history, oracle = _run_both(
            n_valid=300, n_targets=2, seed=seed, config=CFG
        )
        assert len(history) == oracle.iterations
        for it, snap in enumerate(history):
            np.testing.assert_array_equal(
                np.sort(snap["secs"]),
                np.sort(oracle.sampled_history[it]),
                err_msg=f"iteration {it} sampled different seconds",
            )
        np.testing.assert_array_equal(
            np.asarray(final.visited), oracle.visited
        )
        np.testing.assert_array_equal(
            np.asarray(final.remaining), oracle.remaining
        )
        np.testing.assert_allclose(
            np.asarray(final.scores), oracle.scores, rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(final.P), oracle.P, rtol=1e-3, atol=1e-6
        )
        np.testing.assert_array_equal(secs, oracle.pop_secs)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_fallback_branch_matches_oracle(self, seed):
        # n_valid=20 with K=16: after iteration 0 only 4 seconds remain
        # unvisited, so the quartile-masked sampler starves and the engine
        # must take the fallback path (P + K/N without the non-visiting
        # filter, interface_searcher.py:349-351) — which RESAMPLES visited
        # seconds.  Oracle equivalence must hold through that branch.
        cfg = dataclasses.replace(CFG, search_budget=2.5, budget_cap=48)
        n_pad = cfg.padded_frames(20)
        rng = np.random.default_rng(seed + 500)
        conf = np.zeros(n_pad, np.float32)
        conf[:20] = rng.random(20, dtype=np.float32) * 0.4
        tables = OracleTables(
            grid_conf=conf,
            grid_presence=np.zeros((n_pad, cfg.max_objects), bool),  # never found
            verify_conf=np.zeros(n_pad, np.float32),
            verify_presence=np.zeros((n_pad, cfg.max_objects), bool),
        )
        final, secs, history, oracle = _run_both(
            n_valid=20, n_targets=1, seed=seed, config=cfg, tables=tables
        )
        assert oracle.iterations == 3, "fallback branch never exercised"
        for it, snap in enumerate(history):
            np.testing.assert_array_equal(
                np.sort(snap["secs"]), np.sort(oracle.sampled_history[it]),
                err_msg=f"iteration {it}",
            )
        np.testing.assert_array_equal(secs, oracle.pop_secs)

    def test_chained_dispatch_matches_while_loop(self):
        from tstar_tpu.search.engine import run_search_chained

        n_valid, n_targets, seed = 250, 2, 11
        n_pad = CFG.padded_frames(n_valid)
        tables = make_synthetic_tables(n_pad, n_valid, CFG.max_objects, n_targets, 42)
        scorer = TableScorer(
            grid_conf=jnp.asarray(tables.grid_conf),
            grid_presence=jnp.asarray(tables.grid_presence),
            verify_conf=jnp.asarray(tables.verify_conf),
            verify_presence=jnp.asarray(tables.verify_presence),
        )
        s0 = init_state(n_valid, n_targets, CFG, jax.random.key(seed), n_pad=n_pad)
        f_while, secs_while = jax.jit(run_search, static_argnums=2)(s0, scorer, CFG)
        f_chain, secs_chain = run_search_chained(s0, scorer, CFG)
        np.testing.assert_array_equal(np.asarray(secs_chain), np.asarray(secs_while))
        np.testing.assert_array_equal(
            np.asarray(f_chain.scores), np.asarray(f_while.scores)
        )
        np.testing.assert_array_equal(
            np.asarray(f_chain.remaining), np.asarray(f_while.remaining)
        )
        assert int(f_chain.iteration) == int(f_while.iteration)
        assert int(f_chain.budget) == int(f_while.budget)

    def test_while_loop_matches_host_loop(self):
        # run_search (on-device while_loop) and run_search_with_history (host
        # loop over the same jitted step) must produce identical results.
        n_valid, n_targets, seed = 200, 2, 5
        n_pad = CFG.padded_frames(n_valid)
        tables = make_synthetic_tables(n_pad, n_valid, CFG.max_objects, n_targets, 99)
        scorer = TableScorer(
            grid_conf=jnp.asarray(tables.grid_conf),
            grid_presence=jnp.asarray(tables.grid_presence),
            verify_conf=jnp.asarray(tables.verify_conf),
            verify_presence=jnp.asarray(tables.verify_presence),
        )
        s0 = init_state(n_valid, n_targets, CFG, jax.random.key(seed), n_pad=n_pad)
        fused = jax.jit(lambda s: run_search(s, scorer, CFG))
        f1, secs1 = fused(s0)
        f2, secs2, _ = run_search_with_history(s0, scorer, CFG)
        np.testing.assert_array_equal(np.asarray(secs1), np.asarray(secs2))
        np.testing.assert_allclose(
            np.asarray(f1.scores), np.asarray(f2.scores), rtol=1e-6
        )
        assert int(f1.iteration) == int(f2.iteration)


class TestTermination:
    def test_stops_when_all_targets_found(self):
        # A detector that fires target 0 everywhere, strongly: one iteration
        # should verify-and-remove it and stop well under budget.
        n_valid, n_pad = 256, 256
        cfg = dataclasses.replace(CFG, search_budget=1.0)
        c = np.full(n_pad, 0.9, np.float32)
        pres = np.zeros((n_pad, cfg.max_objects), bool)
        pres[:, 0] = True
        tables = OracleTables(c, pres, c, pres)
        scorer = TableScorer(
            grid_conf=jnp.asarray(c), grid_presence=jnp.asarray(pres),
            verify_conf=jnp.asarray(c), verify_presence=jnp.asarray(pres),
        )
        s0 = init_state(n_valid, 1, cfg, jax.random.key(0), n_pad=n_pad)
        final, _ = jax.jit(lambda s: run_search(s, scorer, cfg))(s0)
        assert int(final.iteration) == 1
        assert not bool(np.asarray(final.remaining).any())
        assert int(final.budget) == 256 - 16

    def test_budget_exhaustion(self):
        # Nothing ever detected: the loop must consume the whole budget.
        n_valid, n_pad = 128, 128
        cfg = dataclasses.replace(CFG, search_budget=0.5)  # 64 frames -> 4 iters
        z = np.zeros(n_pad, np.float32)
        pres = np.zeros((n_pad, cfg.max_objects), bool)
        scorer = TableScorer(
            grid_conf=jnp.asarray(z), grid_presence=jnp.asarray(pres),
            verify_conf=jnp.asarray(z), verify_presence=jnp.asarray(pres),
        )
        s0 = init_state(n_valid, 1, cfg, jax.random.key(0), n_pad=n_pad)
        final, secs = jax.jit(lambda s: run_search(s, scorer, cfg))(s0)
        assert int(final.iteration) == 4
        assert int(final.budget) <= 0
        assert bool(np.asarray(final.remaining)[0])
        assert len(np.asarray(secs)) == cfg.search_nframes

    def test_verification_threshold_gates_removal(self):
        # Present in the cell and in verification, but verify confidence at
        # exactly the threshold must NOT remove (strict > comparison,
        # interface_searcher.py:416).
        n_valid = n_pad = 128
        cfg = dataclasses.replace(CFG, confidence_threshold=0.6, search_budget=0.25)
        c = np.full(n_pad, 0.9, np.float32)
        pres = np.zeros((n_pad, cfg.max_objects), bool)
        pres[:, 0] = True
        vconf = np.full(n_pad, 0.6, np.float32)  # == threshold
        scorer = TableScorer(
            grid_conf=jnp.asarray(c), grid_presence=jnp.asarray(pres),
            verify_conf=jnp.asarray(vconf), verify_presence=jnp.asarray(pres),
        )
        s0 = init_state(n_valid, 1, cfg, jax.random.key(0), n_pad=n_pad)
        final, _ = jax.jit(lambda s: run_search(s, scorer, cfg))(s0)
        assert bool(np.asarray(final.remaining)[0])
        # ... but verification still overwrote the scores of sampled frames.
        visited_scores = np.asarray(final.scores)[np.asarray(final.visited)[:n_valid]]
        assert (np.abs(visited_scores - 0.6) < 1e-6).any()


class TestDeterministicPop:
    def test_topk_mode(self):
        cfg = dataclasses.replace(CFG, deterministic_pop=True, search_budget=0.25)
        n_valid = n_pad = 128
        c = np.zeros(n_pad, np.float32)
        hot = [3, 40, 41, 77, 90, 100, 110, 120]
        c[hot] = np.linspace(0.5, 0.9, len(hot)).astype(np.float32)
        pres = np.zeros((n_pad, cfg.max_objects), bool)
        scorer = TableScorer(
            grid_conf=jnp.asarray(c), grid_presence=jnp.asarray(pres),
            verify_conf=jnp.asarray(c), verify_presence=jnp.asarray(pres),
        )
        s0 = init_state(n_valid, 1, cfg, jax.random.key(1), n_pad=n_pad)
        _, secs1 = jax.jit(lambda s: run_search(s, scorer, cfg))(s0)
        _, secs2 = jax.jit(lambda s: run_search(s, scorer, cfg))(s0)
        np.testing.assert_array_equal(np.asarray(secs1), np.asarray(secs2))
        assert list(np.asarray(secs1)) == sorted(np.asarray(secs1).tolist())


class TestStepShape:
    def test_step_is_jittable_and_shapes_static(self):
        n_valid, n_pad = 200, 256
        tables = make_synthetic_tables(n_pad, n_valid, CFG.max_objects, 2, 7)
        scorer = TableScorer(
            grid_conf=jnp.asarray(tables.grid_conf),
            grid_presence=jnp.asarray(tables.grid_presence),
            verify_conf=jnp.asarray(tables.verify_conf),
            verify_presence=jnp.asarray(tables.verify_presence),
        )
        s0 = init_state(n_valid, 2, CFG, jax.random.key(0), n_pad=n_pad)
        step = jax.jit(lambda s: search_step(s, scorer, CFG))
        s1, aux = step(s0)
        s2, _ = step(s1)
        assert s1.scores.shape == (n_pad,)
        assert aux["secs"].shape == (CFG.frames_per_iteration,)
        assert int(s2.iteration) == 2
