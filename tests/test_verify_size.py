"""Reduced-resolution verification (SearchConfig.verify_image_size).

The verify view shares every weight buffer with the main detector except a
bilinearly resampled position embedding (models/owlvit.resize_detector);
these tests pin the weight sharing, the shapes, search integration (float
and int8), and the batched path.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.models.clip_tokenizer import HashTokenizer
from tstar_tpu.models.owlvit import (
    OwlViTConfig,
    OwlViTDetector,
    TextConfig,
    VisionConfig,
    interpolate_position_embedding,
    resize_detector,
)
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


@pytest.fixture(scope="module")
def model_and_vars():
    model = OwlViTDetector(TINY, dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.zeros((2, 8), jnp.int32),
    )
    return model, variables


def _build_scorer(cfg, model, variables, n_valid=150):
    rng = np.random.default_rng(0)
    n_pad = cfg.padded_frames(n_valid)
    cache = jnp.asarray(rng.integers(0, 256, (n_pad, 20, 40, 3), dtype=np.uint8))
    tok = HashTokenizer(vocab_size=100, context=8)
    scorer = make_owlvit_scorer(model, variables, cache, ["couch"], ["tv"], tok, cfg)
    state = init_state(n_valid, 1, cfg, jax.random.key(1), n_pad=n_pad)
    return scorer, state, n_valid


class TestResizeDetector:
    def test_same_size_is_identity(self, model_and_vars):
        model, variables = model_and_vars
        m2, v2 = resize_detector(model, variables, 64)
        assert m2 is model and v2 is variables

    def test_weights_shared_not_copied(self, model_and_vars):
        model, variables = model_and_vars
        m2, v2 = resize_detector(model, variables, 32)
        assert m2.cfg.vision.image_size == 32
        # every leaf except the vision position embedding is the SAME buffer
        p1, p2 = variables["params"], v2["params"]
        assert p2["vision"]["patch_embedding"]["kernel"] is p1["vision"]["patch_embedding"]["kernel"]
        assert p2["box_head"] is p1["box_head"]
        assert p2["vision"]["position_embedding"].shape == (1 + 4, 32)

    def test_interpolation_preserves_cls_and_corners(self):
        rng = np.random.default_rng(1)
        pos = jnp.asarray(rng.standard_normal((1 + 16, 8)).astype(np.float32))
        out = interpolate_position_embedding(pos, 4, 2)
        assert out.shape == (1 + 4, 8)
        np.testing.assert_array_equal(out[0], pos[0])   # CLS untouched

    def test_rejects_non_multiple(self, model_and_vars):
        model, variables = model_and_vars
        with pytest.raises(ValueError, match="multiple"):
            resize_detector(model, variables, 40)

    def test_forward_at_reduced_size(self, model_and_vars):
        model, variables = model_and_vars
        m2, v2 = resize_detector(model, variables, 32)
        feats = m2.apply(
            v2, jnp.zeros((2, 32, 32, 3), jnp.float32),
            method=OwlViTDetector.encode_image,
        )
        assert feats.shape == (2, 4, 32)


class TestReducedVerifySearch:
    @pytest.mark.parametrize("quant", [None, "int8"])
    def test_full_search_runs(self, model_and_vars, quant):
        model, variables = model_and_vars
        cfg = SearchConfig(
            search_budget=0.5, verify_image_size=32, detector_quant=quant,
        )
        scorer, state, n_valid = _build_scorer(cfg, model, variables)
        assert scorer.verify_model is not None
        assert scorer.verify_model.cfg.vision.image_size == 32
        if quant:
            assert scorer.qvision_verify is not None
            assert scorer.qvision_verify["pos"].shape == (1 + 4, 32)
            # quantized kernels are shared, not re-quantized
            assert (scorer.qvision_verify["layers"][0]["qkv"]["w"]
                    is scorer.qvision["layers"][0]["qkv"]["w"])
        final, secs = jax.jit(run_search, static_argnums=2)(state, scorer, cfg)
        secs = np.asarray(secs)
        assert (secs >= 0).all() and (secs < n_valid).all()
        assert len(np.unique(secs)) == cfg.search_nframes

    def test_verify_shapes(self, model_and_vars):
        model, variables = model_and_vars
        cfg = SearchConfig(search_budget=0.5, verify_image_size=32)
        scorer, state, _ = _build_scorer(cfg, model, variables)
        conf, presence = jax.jit(scorer.score_verify)(jnp.arange(16, dtype=jnp.int32))
        assert conf.shape == (16,)
        assert presence.shape == (16, cfg.max_objects)
        assert bool(jnp.isfinite(conf).all())

    def test_score_verify_flat_matches_batch(self, model_and_vars):
        """Cross-video flat verification must agree with the per-video batch
        form on the same (video, frame) pairs."""
        from tstar_tpu.parallel.batched import stack_scorers

        model, variables = model_and_vars
        cfg = SearchConfig(search_budget=0.5, verify_image_size=32)
        s1, _, _ = _build_scorer(cfg, model, variables)
        stacked = stack_scorers([s1, s1], cfg)
        secs = jnp.asarray([[3, 7], [11, 3]], jnp.int32)
        conf_b, pres_b = jax.jit(stacked.score_verify_batch)(secs)
        vid = jnp.asarray([0, 0, 1, 1], jnp.int32)
        flat_secs = secs.reshape(-1)
        conf_f, pres_f = jax.jit(stacked.score_verify_flat)(vid, flat_secs)
        np.testing.assert_allclose(
            np.asarray(conf_f).reshape(2, 2), np.asarray(conf_b),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(pres_f).reshape(2, 2, -1), np.asarray(pres_b)
        )

    def test_batched_step_with_reduced_verify(self, model_and_vars):
        from tstar_tpu.parallel.batched import batched_search_step, stack_scorers

        model, variables = model_and_vars
        cfg = SearchConfig(search_budget=0.5, verify_image_size=32)
        scorer, state, _ = _build_scorer(cfg, model, variables)
        batched = stack_scorers([scorer, scorer], cfg)
        assert batched.verify_variables is scorer.verify_variables
        states = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), state)
        out = jax.jit(batched_search_step, static_argnums=2)(states, batched, cfg)
        assert bool(jnp.isfinite(out.P).all())
