"""Integration: full search loop driven by the OWL-ViT scorer (tiny model).

Random weights can't detect anything meaningful, so these tests check the
plumbing contracts: shapes, determinism, jit-ability of the entire
pixels -> detector -> splat -> search pipeline, and the prompt/weight layout.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.models.clip_tokenizer import HashTokenizer
from tstar_tpu.models.owlvit import OwlViTConfig, OwlViTDetector, TextConfig, VisionConfig
from tstar_tpu.search.detector_scorer import make_owlvit_scorer
from tstar_tpu.search.engine import run_search
from tstar_tpu.search.state import init_state
from tstar_tpu.utils.config import SearchConfig

TINY = OwlViTConfig(
    vision=VisionConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        patch_size=16, image_size=64,
    ),
    text=TextConfig(
        vocab_size=100, hidden_size=24, num_layers=2, num_heads=4,
        intermediate_size=48, max_length=8,
    ),
    projection_dim=24,
)

CFG = SearchConfig(search_budget=0.5)


@pytest.fixture(scope="module")
def scorer_and_state():
    model = OwlViTDetector(TINY, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n_valid = 150
    n_pad = CFG.padded_frames(n_valid)
    cache = jnp.asarray(
        rng.integers(0, 256, size=(n_pad, 20, 40, 3), dtype=np.uint8)
    )
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.zeros((2, 8), jnp.int32),
    )
    tok = HashTokenizer(vocab_size=100, context=8)
    scorer = make_owlvit_scorer(
        model, variables, cache,
        target_objects=["couch", "lamp"], cue_objects=["tv", "chair"],
        tokenizer=tok, config=CFG,
    )
    state = init_state(n_valid, 2, CFG, jax.random.key(1), n_pad=n_pad)
    return scorer, state, n_valid


class TestScorerContracts:
    def test_score_grid_shapes(self, scorer_and_state):
        scorer, state, _ = scorer_and_state
        secs = jnp.arange(16, dtype=jnp.int32) * 9
        conf, presence = jax.jit(scorer.score_grid)(secs)
        assert conf.shape == (16,)
        assert presence.shape == (16, CFG.max_objects)
        assert bool(jnp.all(jnp.isfinite(conf)))
        assert bool(jnp.all(conf >= 0))

    def test_score_verify_shapes(self, scorer_and_state):
        scorer, state, _ = scorer_and_state
        secs = jnp.arange(16, dtype=jnp.int32)
        conf, presence = jax.jit(scorer.score_verify)(secs)
        assert conf.shape == (16,)
        assert presence.shape == (16, CFG.max_objects)
        assert bool(jnp.all(jnp.isfinite(conf)))

    def test_prompt_layout(self, scorer_and_state):
        scorer, _, _ = scorer_and_state
        w = np.asarray(scorer.class_weights)
        np.testing.assert_allclose(w[:2], 1.0)   # targets
        np.testing.assert_allclose(w[2:], 0.5)   # cues + pad prompt + padding
        m = np.asarray(scorer.query_mask)
        assert m[:5].all()        # 2 targets + 2 cues + ' '
        assert not m[5:].any()    # masked padding rows
        assert np.isfinite(np.asarray(scorer.query_embeds)).all()

    def test_full_search_jits_and_is_deterministic(self, scorer_and_state):
        scorer, state, _ = scorer_and_state
        run = jax.jit(lambda s: run_search(s, scorer, CFG))
        final1, secs1 = run(state)
        final2, secs2 = run(state)
        np.testing.assert_array_equal(np.asarray(secs1), np.asarray(secs2))
        assert int(final1.iteration) >= 1
        assert np.isfinite(np.asarray(final1.P)).all()
        # budget arithmetic: 150 * 0.5 = 75 -> at most 5 iterations
        assert int(final1.iteration) <= 5


class TestBucketedVerification:
    def test_bucketed_matches_full_verification(self, scorer_and_state):
        """verify_batch=T rescores only candidate frames, T at a time — the
        search trajectory must match the rescore-all-K form exactly."""
        import dataclasses

        scorer, state, n_valid = scorer_and_state
        cfg_full = dataclasses.replace(CFG, verify_batch=None,
                                       confidence_threshold=0.2)
        cfg_b4 = dataclasses.replace(cfg_full, verify_batch=4)
        cfg_b3 = dataclasses.replace(cfg_full, verify_batch=3)  # non-divisor

        run = jax.jit(run_search, static_argnums=2)
        finals = {}
        for name, cfg in (("full", cfg_full), ("b4", cfg_b4), ("b3", cfg_b3)):
            scorer_cfg = dataclasses.replace(scorer, config=cfg)
            final, secs = run(state, scorer_cfg, cfg)
            finals[name] = (final, np.asarray(secs))
        for name in ("b4", "b3"):
            np.testing.assert_array_equal(finals["full"][1], finals[name][1])
            np.testing.assert_array_equal(
                np.asarray(finals["full"][0].remaining),
                np.asarray(finals[name][0].remaining),
            )
            np.testing.assert_allclose(
                np.asarray(finals["full"][0].scores),
                np.asarray(finals[name][0].scores),
                atol=1e-6,
            )
            assert int(finals["full"][0].iteration) == int(finals[name][0].iteration)


class TestComposedGridProjection:
    """The composed cache->embedding grid path (opt-in,
    TSTAR_COMPOSED_PATCH=1 — measured e2e negative as a default, see
    detector_scorer._grid_projection) must agree with the explicit pixel
    chain it replaces."""

    def test_composed_matches_pixel_path(self, scorer_and_state, monkeypatch):
        scorer, state, n_valid = scorer_and_state
        assert scorer.grid_proj_w is None       # default is the pixel chain
        monkeypatch.setenv("TSTAR_COMPOSED_PATCH", "1")
        from tstar_tpu.search.detector_scorer import _grid_projection

        w, b, src, opt_in = _grid_projection(
            scorer.model, scorer.variables, scorer.cache.shape[1:3],
            scorer.config,
        )
        assert w is not None                    # fixture geometry is aligned
        assert opt_in
        composed = scorer.replace(
            grid_proj_w=w, grid_proj_b=b, grid_src_patch=src,
            grid_proj_opt_in=True,
        )
        secs = jnp.asarray(np.arange(16) * 7 % n_valid)
        conf_c, pres_c = composed.score_grid(secs)
        conf_p, pres_p = scorer.score_grid(secs)
        np.testing.assert_allclose(
            np.asarray(conf_c), np.asarray(conf_p), atol=5e-3, rtol=1e-3
        )
        np.testing.assert_array_equal(np.asarray(pres_c), np.asarray(pres_p))

    def test_default_off(self, scorer_and_state):
        scorer, _, _ = scorer_and_state
        from tstar_tpu.search.detector_scorer import _grid_projection

        w, b, src, opt_in = _grid_projection(
            scorer.model, scorer.variables, scorer.cache.shape[1:3],
            scorer.config,
        )
        assert w is None and b is None and src is None and not opt_in
