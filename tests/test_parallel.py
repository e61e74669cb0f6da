"""Multi-device tests on the virtual 8-device CPU mesh.

Covers: batched multi-video search equivalence with single-video runs,
masked early termination, mesh construction, and the sharded DP+TP execution
path the driver dry-runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tstar_tpu.models.clip_tokenizer import HashTokenizer
from tstar_tpu.models.owlvit import OwlViTConfig, OwlViTDetector, TextConfig, VisionConfig
from tstar_tpu.parallel.batched import run_search_batched
from tstar_tpu.parallel.mesh import make_mesh
from tstar_tpu.parallel.shardings import owlvit_param_shardings, shard_variables
from tstar_tpu.search.detector_scorer import OwlVitScorer, make_owlvit_scorer
from tstar_tpu.search.engine import run_search
from tstar_tpu.search.scorers import TableScorer
from tstar_tpu.search.state import SearchState, init_state
from tstar_tpu.utils.config import SearchConfig

from tests.oracle import make_synthetic_tables

CFG = SearchConfig(search_budget=0.5)


def _stack_states(states):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def _make_table_scorers(n_videos, n_valid, n_pad, seed0=100):
    tables = [
        make_synthetic_tables(n_pad, n_valid, CFG.max_objects, 1, seed0 + i)
        for i in range(n_videos)
    ]
    return TableScorer(
        grid_conf=jnp.stack([jnp.asarray(t.grid_conf) for t in tables]),
        grid_presence=jnp.stack([jnp.asarray(t.grid_presence) for t in tables]),
        verify_conf=jnp.stack([jnp.asarray(t.verify_conf) for t in tables]),
        verify_presence=jnp.stack([jnp.asarray(t.verify_presence) for t in tables]),
    ), tables


class TestMesh:
    def test_requires_8_devices(self):
        assert jax.device_count() >= 8, "conftest must force 8 CPU devices"

    def test_make_mesh_shapes(self):
        m = make_mesh()
        assert m.shape == {"data": 8, "model": 1}
        m2 = make_mesh(model=2)
        assert m2.shape == {"data": 4, "model": 2}
        with pytest.raises(AssertionError):
            make_mesh(data=3, model=2)


class TestBatchedSearch:
    def test_matches_single_video_runs(self):
        n_videos, n_valid = 4, 200
        n_pad = CFG.padded_frames(n_valid)
        batched_scorer, tables = _make_table_scorers(n_videos, n_valid, n_pad)
        states = [
            init_state(n_valid, 1, CFG, jax.random.key(i), n_pad=n_pad)
            for i in range(n_videos)
        ]
        finals, secs = jax.jit(
            lambda ss: run_search_batched(ss, batched_scorer, CFG)
        )(_stack_states(states))

        for i in range(n_videos):
            scorer_i = TableScorer(
                grid_conf=batched_scorer.grid_conf[i],
                grid_presence=batched_scorer.grid_presence[i],
                verify_conf=batched_scorer.verify_conf[i],
                verify_presence=batched_scorer.verify_presence[i],
            )
            f_i, s_i = jax.jit(lambda s, sc=scorer_i: run_search(s, sc, CFG))(states[i])
            np.testing.assert_array_equal(np.asarray(secs)[i], np.asarray(s_i))
            np.testing.assert_allclose(
                np.asarray(finals.scores)[i], np.asarray(f_i.scores), rtol=1e-5
            )
            assert int(finals.iteration[i]) == int(f_i.iteration)

    def test_early_finishers_frozen(self):
        # Video 0 finds its target instantly; video 1 never does.  Video 0's
        # state must freeze (masked no-op) while video 1 runs to budget.
        n_valid = n_pad = 128
        hot = np.full(n_pad, 0.9, np.float32)
        pres = np.zeros((n_pad, CFG.max_objects), bool)
        pres[:, 0] = True
        cold = np.zeros(n_pad, np.float32)
        nopres = np.zeros_like(pres)
        scorer = TableScorer(
            grid_conf=jnp.stack([jnp.asarray(hot), jnp.asarray(cold)]),
            grid_presence=jnp.stack([jnp.asarray(pres), jnp.asarray(nopres)]),
            verify_conf=jnp.stack([jnp.asarray(hot), jnp.asarray(cold)]),
            verify_presence=jnp.stack([jnp.asarray(pres), jnp.asarray(nopres)]),
        )
        states = _stack_states([
            init_state(n_valid, 1, CFG, jax.random.key(0), n_pad=n_pad),
            init_state(n_valid, 1, CFG, jax.random.key(1), n_pad=n_pad),
        ])
        finals, _ = jax.jit(lambda ss: run_search_batched(ss, scorer, CFG))(states)
        assert int(finals.iteration[0]) == 1          # froze after success
        assert int(finals.iteration[1]) == 4          # 64-frame budget / 16
        assert not bool(np.asarray(finals.remaining)[0].any())
        assert bool(np.asarray(finals.remaining)[1].any())

    def test_auto_driver_routing_and_identity(self, monkeypatch):
        """The measured-crossover driver (r5): run_search_batched_auto must
        route B <= DISPATCH_WHILE_LOOP_MAX_BATCH to the one-dispatch
        while_loop and larger B to the host-chained driver, and both forms
        must return bit-identical keyframes (the property the on-chip A/B
        asserts, scripts/ab_batched_dispatch.py)."""
        from tstar_tpu.parallel import batched

        n_videos, n_valid = 2, 200
        n_pad = CFG.padded_frames(n_valid)
        iters = CFG.iteration_cap(n_valid)
        batched_scorer, _ = _make_table_scorers(n_videos, n_valid, n_pad)
        states = _stack_states([
            init_state(n_valid, 1, CFG, jax.random.key(i), n_pad=n_pad)
            for i in range(n_videos)
        ])

        finals_w, secs_w = batched.run_search_batched_auto(
            states, batched_scorer, CFG, max_iterations=iters
        )
        finals_c, secs_c = batched.run_search_batched_chained(
            states, batched_scorer, CFG, max_iterations=iters
        )
        np.testing.assert_array_equal(np.asarray(secs_w), np.asarray(secs_c))
        np.testing.assert_array_equal(
            np.asarray(finals_w.iteration), np.asarray(finals_c.iteration)
        )
        np.testing.assert_array_equal(
            np.asarray(finals_w.scores), np.asarray(finals_c.scores)
        )

        # Routing: tag each underlying driver and flip the crossover.
        calls = []
        real_while, real_chained = (
            batched.run_search_batched, batched.run_search_batched_chained
        )
        monkeypatch.setattr(
            batched, "run_search_batched",
            lambda *a, **k: (calls.append("while"), real_while(*a, **k))[1],
        )
        monkeypatch.setattr(
            batched, "run_search_batched_chained",
            lambda *a, **k: (calls.append("chained"), real_chained(*a, **k))[1],
        )
        batched.run_search_batched_auto(
            states, batched_scorer, CFG, max_iterations=iters
        )
        assert calls == ["while"]          # B=2 <= crossover
        monkeypatch.setattr(batched, "DISPATCH_WHILE_LOOP_MAX_BATCH", 1)
        batched.run_search_batched_auto(
            states, batched_scorer, CFG, max_iterations=iters
        )
        assert calls == ["while", "chained"]


class TestShardedExecution:
    def test_dp_tp_sharded_batched_search_step(self):
        # The driver's dryrun path: DP over videos x TP over detector params
        # on a 4x2 mesh, one full batched detector-backed step, executed.
        mesh = make_mesh(data=4, model=2)
        tiny = OwlViTConfig(
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                                intermediate_size=64, patch_size=16, image_size=64),
            text=TextConfig(vocab_size=100, hidden_size=24, num_layers=2,
                            num_heads=4, intermediate_size=48, max_length=8),
            projection_dim=24,
        )
        model = OwlViTDetector(tiny, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((2, 8), jnp.int32)
        )
        sharded_vars = shard_variables(mesh, variables)
        # TP rule sanity: fc1 kernels shard their output dim.
        fc1 = sharded_vars["params"]["vision"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"]
        assert fc1.sharding.spec == P(None, "model")

        n_videos, n_valid = 4, 64
        n_pad = 128
        cfg = SearchConfig(search_budget=0.5)
        tok = HashTokenizer(vocab_size=100, context=8)
        rng = np.random.default_rng(0)
        caches, scorers, states = [], [], []
        for i in range(n_videos):
            cache = jnp.asarray(
                rng.integers(0, 256, (n_pad, 20, 40, 3), dtype=np.uint8)
            )
            sc = make_owlvit_scorer(
                model, sharded_vars, cache, ["couch"], ["tv"], tok, cfg
            )
            scorers.append(sc)
            states.append(init_state(n_valid, 1, cfg, jax.random.key(i), n_pad=n_pad))

        batched_scorer = OwlVitScorer(
            cache=jnp.stack([s.cache for s in scorers]),
            variables=sharded_vars,
            query_embeds=jnp.stack([s.query_embeds for s in scorers]),
            query_mask=jnp.stack([s.query_mask for s in scorers]),
            class_weights=jnp.stack([s.class_weights for s in scorers]),
            model=model,
            config=cfg,
        )
        stacked = _stack_states(states)
        dp = NamedSharding(mesh, P("data"))
        stacked = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
            stacked,
        )

        from tstar_tpu.parallel.batched import batched_search_step

        step = jax.jit(lambda ss: batched_search_step(ss, batched_scorer, cfg))
        out = step(stacked)
        assert out.scores.shape == (n_videos, n_pad)
        assert bool(jnp.isfinite(out.P).all())
        assert int(out.iteration.sum()) == n_videos  # every video advanced

    @staticmethod
    def _tiny_detector_setup(n_videos, n_valid, n_pad, cfg):
        tiny = OwlViTConfig(
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                                intermediate_size=64, patch_size=16, image_size=64),
            text=TextConfig(vocab_size=100, hidden_size=24, num_layers=2,
                            num_heads=4, intermediate_size=48, max_length=8),
            projection_dim=24,
        )
        model = OwlViTDetector(tiny, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((2, 8), jnp.int32)
        )
        tok = HashTokenizer(vocab_size=100, context=8)
        rng = np.random.default_rng(3)
        scorers, states = [], []
        for i in range(n_videos):
            cache = jnp.asarray(
                rng.integers(0, 256, (n_pad, 20, 40, 3), dtype=np.uint8)
            )
            scorers.append(make_owlvit_scorer(
                model, variables, cache, ["couch"], ["tv"], tok, cfg
            ))
            states.append(init_state(n_valid, 1, cfg, jax.random.key(10 + i),
                                     n_pad=n_pad))
        batched_scorer = OwlVitScorer(
            cache=jnp.stack([s.cache for s in scorers]),
            variables=variables,
            query_embeds=jnp.stack([s.query_embeds for s in scorers]),
            query_mask=jnp.stack([s.query_mask for s in scorers]),
            class_weights=jnp.stack([s.class_weights for s in scorers]),
            model=model,
            config=cfg,
        )
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
        return model, variables, batched_scorer, stacked

    def test_dp_tp_full_search_equals_unsharded(self):
        """VERDICT r2 item 3a: a COMPLETE batched detector-backed search on a
        dp=4 x tp=2 mesh must reproduce the unsharded single-device batched
        search seed-for-seed — same sampled keyframes, same iteration counts,
        same scores (float tolerance for GSPMD reduction-order drift)."""
        import dataclasses

        from tstar_tpu.parallel.batched import run_search_batched_chained
        from tstar_tpu.parallel.multi_video import PER_VIDEO_FIELDS

        # detector_threshold 0.4: random tiny-model confidences land both
        # above and below, so detection/verification paths genuinely fire.
        cfg = SearchConfig(search_budget=0.5, detector_threshold=0.4)
        n_videos, n_valid, n_pad = 4, 64, 128
        iters = cfg.iteration_cap(n_valid)
        model, variables, batched_scorer, stacked = self._tiny_detector_setup(
            n_videos, n_valid, n_pad, cfg
        )

        finals_u, secs_u = run_search_batched_chained(
            stacked, batched_scorer, cfg, max_iterations=iters
        )

        mesh = make_mesh(data=4, model=2)
        sharded_vars = shard_variables(mesh, variables)
        # On a dp-sharded mesh the production path pins per-video verify
        # buckets (multi_video._search_bucket does the same).
        cfg_mesh = dataclasses.replace(cfg, verify_flat=False)

        def dp_put(x):
            return jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            )

        per_video = {
            f: dp_put(getattr(batched_scorer, f))
            for f in PER_VIDEO_FIELDS[type(batched_scorer).__name__]
        }
        sharded_scorer = dataclasses.replace(
            batched_scorer, variables=sharded_vars, config=cfg_mesh, **per_video
        )
        stacked_s = jax.tree_util.tree_map(dp_put, stacked)
        finals_s, secs_s = run_search_batched_chained(
            stacked_s, sharded_scorer, cfg_mesh, max_iterations=iters
        )

        np.testing.assert_array_equal(np.asarray(secs_s), np.asarray(secs_u))
        np.testing.assert_array_equal(
            np.asarray(finals_s.iteration), np.asarray(finals_u.iteration)
        )
        np.testing.assert_array_equal(
            np.asarray(finals_s.remaining), np.asarray(finals_u.remaining)
        )
        np.testing.assert_allclose(
            np.asarray(finals_s.scores), np.asarray(finals_u.scores),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(finals_s.P), np.asarray(finals_u.P),
            rtol=1e-5, atol=1e-7,
        )

    def test_dp_tp_full_search_equals_unsharded_with_fused_mha(self, monkeypatch):
        """VERDICT r3 item 2: the fused Pallas MHA now RUNS under the
        dp x tp production mesh (shard-major grouped q|k|v layout +
        custom_partitioning over (batch, head-group)) — and sharded search
        must still equal unsharded search seed-for-seed with the kernel
        ACTIVE on both sides (interpret mode on the CPU suite; the plan is
        forced past the backend/batch gates, every structural gate real)."""
        import dataclasses

        from tstar_tpu.kernels import attention
        from tstar_tpu.parallel.batched import run_search_batched_chained
        from tstar_tpu.parallel.multi_video import PER_VIDEO_FIELDS

        # Kernel-compatible dims: Dh=64 -> hpb=2; heads=4, tp=2 -> 2 local
        # heads per shard; S = (64/4)^2 + 1 = 257 inside the [256, 1152]
        # VMEM window.  The text tower (S=8) stays on XLA (gate rejects it).
        tiny = OwlViTConfig(
            vision=VisionConfig(hidden_size=256, num_layers=2, num_heads=4,
                                intermediate_size=128, patch_size=4,
                                image_size=64),
            text=TextConfig(vocab_size=100, hidden_size=24, num_layers=2,
                            num_heads=4, intermediate_size=48, max_length=8),
            projection_dim=24,
        )
        model = OwlViTDetector(tiny, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((2, 8), jnp.int32),
        )
        cfg = SearchConfig(search_budget=0.5, detector_threshold=0.4)
        n_videos, n_valid, n_pad = 4, 64, 128
        iters = cfg.iteration_cap(n_valid)
        tok = HashTokenizer(vocab_size=100, context=8)
        rng = np.random.default_rng(7)
        scorers, states = [], []
        for i in range(n_videos):
            cache = jnp.asarray(
                rng.integers(0, 256, (n_pad, 20, 40, 3), dtype=np.uint8)
            )
            scorers.append(make_owlvit_scorer(
                model, variables, cache, ["couch"], ["tv"], tok, cfg
            ))
            states.append(init_state(n_valid, 1, cfg, jax.random.key(20 + i),
                                     n_pad=n_pad))
        batched_scorer = OwlVitScorer(
            cache=jnp.stack([s.cache for s in scorers]),
            variables=variables,
            query_embeds=jnp.stack([s.query_embeds for s in scorers]),
            query_mask=jnp.stack([s.query_mask for s in scorers]),
            class_weights=jnp.stack([s.class_weights for s in scorers]),
            model=model,
            config=cfg,
        )
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

        # Force the kernel past the backend + batch-crossover gates only
        # (structural gates stay real); run it in interpret mode on CPU.
        # The backend monkeypatch is module-global, so explicitly keep the
        # OTHER TPU kernels (Pallas LN) off — they have no interpret shim
        # here and would hard-fail on the CPU backend.
        monkeypatch.setenv("TSTAR_FUSED_MHA", "force")
        monkeypatch.setenv("TSTAR_PALLAS_LN", "0")
        monkeypatch.setattr(attention.jax, "default_backend", lambda: "tpu")
        real = attention.fused_mha_from_qkv.__wrapped__  # un-jitted fn
        monkeypatch.setattr(
            attention, "fused_mha_from_qkv",
            lambda qkv, nh, *, interpret=False, tp_groups=1: real(
                qkv, nh, interpret=True, tp_groups=tp_groups
            ),
        )

        finals_u, secs_u = run_search_batched_chained(
            stacked, batched_scorer, cfg, max_iterations=iters
        )

        mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
        sharded_vars = shard_variables(mesh, variables)
        cfg_mesh = dataclasses.replace(cfg, verify_flat=False)

        def dp_put(x):
            return jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            )

        per_video = {
            f: dp_put(getattr(batched_scorer, f))
            for f in PER_VIDEO_FIELDS[type(batched_scorer).__name__]
        }
        sharded_scorer = dataclasses.replace(
            batched_scorer, variables=sharded_vars, config=cfg_mesh, **per_video
        )
        stacked_s = jax.tree_util.tree_map(dp_put, stacked)

        # The entry point must infer (dp=2, tp=2) from the shardings and
        # plan the grouped tp layout on its own (r3 item 8: no caller-side
        # guard) — pin that while we're tracing.
        planned = {}
        real_plan = attention.fused_mha_plan

        def spy_plan(*a, **kw):
            out = real_plan(*a, **kw)
            if out is not None and a[1] == 257:   # vision tower only
                planned[out] = planned.get(out, 0) + 1
            return out

        monkeypatch.setattr(attention, "fused_mha_plan", spy_plan)
        finals_s, secs_s = run_search_batched_chained(
            stacked_s, sharded_scorer, cfg_mesh, max_iterations=iters
        )
        assert 2 in planned, f"tp=2 grouped plan never used: {planned}"

        np.testing.assert_array_equal(np.asarray(secs_s), np.asarray(secs_u))
        np.testing.assert_array_equal(
            np.asarray(finals_s.iteration), np.asarray(finals_u.iteration)
        )
        np.testing.assert_array_equal(
            np.asarray(finals_s.remaining), np.asarray(finals_u.remaining)
        )
        np.testing.assert_allclose(
            np.asarray(finals_s.scores), np.asarray(finals_u.scores),
            rtol=1e-5, atol=1e-6,
        )

    def test_mesh_info_gate_without_caller_guard(self, monkeypatch):
        """VERDICT r3 item 8 done-criterion: a dp-sharded batch of 8 videos
        (1 per shard) must trace with the fused kernel OFF without the
        caller doing anything — the entry point infers the per-shard batch
        from the states' shardings."""
        from tstar_tpu.kernels import attention
        from tstar_tpu.search.state import init_state as _init

        monkeypatch.setenv("TSTAR_FUSED_MHA", "1")
        monkeypatch.setattr(attention.jax, "default_backend", lambda: "tpu")
        calls = []
        real_plan = attention.fused_mha_plan
        monkeypatch.setattr(
            attention, "fused_mha_plan",
            lambda *a, **kw: calls.append(a) or real_plan(*a, **kw),
        )

        n_videos, n_valid, n_pad = 8, 64, 128
        cfg = SearchConfig(search_budget=0.5)
        batched_scorer, _ = _make_table_scorers(n_videos, n_valid, n_pad)
        # TableScorer has no encoder, so probe the gate directly under the
        # guard the entry point sets: 8 videos / dp=8 -> 1 per shard.
        mesh = make_mesh(data=8, model=1)
        states = _stack_states([
            _init(n_valid, 1, cfg, jax.random.key(i), n_pad=n_pad)
            for i in range(n_videos)
        ])
        dp_states = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            ),
            states,
        )
        from tstar_tpu.parallel.batched import _mesh_info_guard

        with _mesh_info_guard(dp_states):
            info = attention.current_mesh_kernel_info()
            assert (info.dp, info.tp) == (8, 1)
            # global batch 8 passes the naive gate; per-shard batch 1 must not
            assert real_plan(8, 577, 3 * 768, 12, None) is None
        # outside the guard the same shape fuses
        assert real_plan(8, 577, 3 * 768, 12, None) == 1

    def test_real_dims_dp_tp_lowering_gate(self, monkeypatch):
        """VERDICT r4 item 7: abstract-lower AND compile the batched search
        step at owlvit-base-patch32 REAL dims (12 heads / 768 hidden / S=577)
        under a dp=4 x tp=2 mesh with the fused kernels forced on.

        Everything is ShapeDtypeStruct — no real weights, no execution — so a
        sharding-rule bug that only manifests at production dims (e.g. a head
        count not divisible by tp after the grouped q|k|v layout) fails here
        instead of on hardware.  ``.compile()`` matters: custom_partitioning's
        partition callbacks only run inside the SPMD partitioner, so lowering
        alone would not exercise the grouped-q|k|v rule."""
        import dataclasses

        from tstar_tpu.kernels import attention, patch_matmul
        from tstar_tpu.models.owlvit import owlvit_base_patch32
        from tstar_tpu.parallel.batched import batched_search_step, _mesh_info_guard

        monkeypatch.setenv("TSTAR_FUSED_MHA", "force")
        monkeypatch.setenv("TSTAR_PALLAS_LN", "0")   # no interpret shim here
        monkeypatch.setattr(attention.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(patch_matmul.jax, "default_backend", lambda: "tpu")
        real_mha = attention.fused_mha_from_qkv.__wrapped__
        monkeypatch.setattr(
            attention, "fused_mha_from_qkv",
            lambda qkv, nh, *, interpret=False, tp_groups=1: real_mha(
                qkv, nh, interpret=True, tp_groups=tp_groups
            ),
        )
        real_patch = patch_matmul.patch_embed_matmul.__wrapped__
        monkeypatch.setattr(
            patch_matmul, "patch_embed_matmul",
            lambda pixels, kernel, *, interpret=False: real_patch(
                pixels, kernel, interpret=True
            ),
        )
        planned = {}
        real_plan = attention.fused_mha_plan

        def spy_plan(*a, **kw):
            out = real_plan(*a, **kw)
            planned[(a[1], a[3], out)] = planned.get((a[1], a[3], out), 0) + 1
            return out

        monkeypatch.setattr(attention, "fused_mha_plan", spy_plan)

        B, n_valid, n_pad = 8, 64, 128
        cfg = SearchConfig(search_budget=0.5, use_pallas_preprocess=False,
                           verify_flat=False)
        model = OwlViTDetector(owlvit_base_patch32(), dtype=jnp.bfloat16)
        tok = HashTokenizer(vocab_size=49408, context=16)

        def build_all(_):
            variables = model.init(
                jax.random.key(0), jnp.zeros((1, 768, 768, 3)),
                jnp.zeros((2, 16), jnp.int32),
            )
            cache = jnp.zeros((n_pad, 192, 384, 3), jnp.uint8)
            sc = make_owlvit_scorer(
                model, variables, cache, ["couch"], ["tv"], tok, cfg
            )

            def bcast(x):
                return jnp.broadcast_to(x[None], (B,) + x.shape)

            batched = dataclasses.replace(
                sc, cache=bcast(sc.cache), query_embeds=bcast(sc.query_embeds),
                query_mask=bcast(sc.query_mask),
                class_weights=bcast(sc.class_weights),
            )
            states = [
                init_state(n_valid, 1, cfg, jax.random.key(i), n_pad=n_pad)
                for i in range(B)
            ]
            return batched, jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *states
            )

        scorer_sds, states_sds = jax.eval_shape(build_all, 0)
        mesh = make_mesh(data=4, model=2)
        var_specs = owlvit_param_shardings(mesh, scorer_sds.variables)
        vars_sharded = jax.tree_util.tree_map(
            lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
            scorer_sds.variables, var_specs,
        )

        def with_sharding(spec_fn):
            def go(l):
                if l is None:
                    return None
                return jax.ShapeDtypeStruct(
                    l.shape, l.dtype, sharding=NamedSharding(mesh, spec_fn(l))
                )
            return go

        dp_sds = with_sharding(lambda l: P("data", *([None] * (l.ndim - 1))))
        rep_sds = with_sharding(lambda l: P())
        scorer_sharded = dataclasses.replace(
            scorer_sds,
            variables=vars_sharded,
            cache=dp_sds(scorer_sds.cache),
            query_embeds=dp_sds(scorer_sds.query_embeds),
            query_mask=dp_sds(scorer_sds.query_mask),
            class_weights=dp_sds(scorer_sds.class_weights),
            gb_awk=rep_sds(scorer_sds.gb_awk),
            gb_bias=rep_sds(scorer_sds.gb_bias),
            gb_ah=rep_sds(scorer_sds.gb_ah),
        )
        states_sharded = jax.tree_util.tree_map(dp_sds, states_sds)

        step = jax.jit(lambda ss, sc: batched_search_step(ss, sc, cfg))
        with _mesh_info_guard(states_sharded):
            info = attention.current_mesh_kernel_info()
            assert (info.dp, info.tp) == (4, 2)   # inferred from SDS shardings
            lowered = step.lower(states_sharded, scorer_sharded)
        # Grouped tp=2 plan used on both vision forwards (grid + verify):
        # 12 layers x 2 forwards.  The text tower (S=16) must stay on XLA.
        assert planned.get((577, 12, 2), 0) >= 24, planned
        assert not any(s == 16 and g for (s, _, g), _ in planned.items()), planned
        # SPMD-partition at real dims: custom_partitioning partition
        # callbacks for the grouped q|k|v MHA + the patch-embed kernel run
        # here (and raise on any rule/layout inconsistency).
        lowered.compile()

    def test_tp_sharded_generate_matches_unsharded(self):
        """VERDICT r2 item 3b: TP-sharded greedy decode == unsharded decode,
        token for token."""
        from tstar_tpu.models.generate import generate
        from tstar_tpu.models.qwen2vl import (
            Qwen2VLConfig,
            Qwen2VLModel,
            Qwen2VLTextConfig,
            Qwen2VLVisionConfig,
            build_mrope_position_ids,
        )

        vlm_cfg = Qwen2VLConfig(
            vision=Qwen2VLVisionConfig(
                depth=2, embed_dim=16, num_heads=2, mlp_ratio=2.0, patch_size=2,
                temporal_patch_size=1, spatial_merge_size=2, hidden_size=32,
            ),
            text=Qwen2VLTextConfig(
                vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=64, mrope_section=(1, 1, 2),
            ),
            image_token_id=251,
        )
        vlm = Qwen2VLModel(vlm_cfg, dtype=jnp.float32)
        rng = np.random.default_rng(5)
        ids = np.array([[5, 251, 251, 251, 251, 9]])
        patches = jnp.asarray(rng.standard_normal((1, 16, 12)).astype(np.float32))
        init_pos = jnp.zeros((3, 1, ids.shape[1]), jnp.int32)
        vlm_vars = vlm.init(
            jax.random.key(3), jnp.asarray(ids), init_pos, None, patches, (4, 4)
        )
        pos = build_mrope_position_ids(ids[0], 251, [(1, 4, 4)], 2)[:, None]

        def decode(vars_):
            return np.asarray(generate(
                vlm, vars_, ids, np.array([6]), pos, max_new_tokens=8,
                eos_token_ids=[255], temperature=0.0,
                image_patches=patches, image_grid_hw=(4, 4),
                cache_dtype=jnp.float32,
            ))

        tokens_u = decode(vlm_vars)
        mesh = make_mesh(data=4, model=2)
        tokens_s = decode(shard_variables(mesh, vlm_vars))
        np.testing.assert_array_equal(tokens_s, tokens_u)
