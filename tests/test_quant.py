"""Int8 (W8A8) quantized detector path: exact quant math + bounded drift.

Three layers of evidence (all hermetic, CPU, random weights):
  1. ``dense_w8a8`` matches a NumPy simulation of the same scheme
     bit-for-bit (int32 accumulation is exact in f32 for these sizes).
  2. The full quantized vision tower (``encode_image_int8``) tracks the
     float tower closely: per-patch feature cosine and detection-score
     agreement are bounded.
  3. The scorer/search/batched plumbing runs end-to-end with
     ``detector_quant='int8'`` and preserves all output contracts.
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
)
from tstar_tpu.models.owlvit_quant import encode_image_int8, quantize_vision_tower
from tstar_tpu.ops.quant import dense_w8a8, dense_w8a16, quantize_weight
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


def _numpy_w8a8(x, w, b):
    """Independent NumPy simulation of the W8A8 scheme in ops/quant.py."""
    w = np.asarray(w, np.float64)
    w_scale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    w_i8 = np.clip(np.round(w / w_scale), -127, 127).astype(np.int64)
    xf = np.asarray(x, np.float64)
    x_scale = np.maximum(np.abs(xf).max(axis=-1, keepdims=True), 1e-12) / 127.0
    x_i8 = np.clip(np.round(xf / x_scale), -127, 127).astype(np.int64)
    acc = x_i8 @ w_i8
    return acc.astype(np.float64) * x_scale * w_scale + b


class TestQuantPrimitives:
    def test_dense_w8a8_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((5, 37, 24)).astype(np.float32)
        w = rng.standard_normal((24, 48)).astype(np.float32)
        b = rng.standard_normal((48,)).astype(np.float32)
        w_i8, w_s = quantize_weight(w)
        got = np.asarray(
            jax.jit(dense_w8a8)(jnp.asarray(x), jnp.asarray(w_i8),
                                jnp.asarray(w_s), jnp.asarray(b))
        )
        want = _numpy_w8a8(x, w, b)
        # int32 accumulation is exact; the only difference vs the f64
        # simulation is the f32 dequant arithmetic.
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_quantize_weight_roundtrip_error_bounded(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((64, 32)).astype(np.float32)
        w_i8, s = quantize_weight(w)
        err = np.abs(w_i8.astype(np.float32) * s - w)
        # symmetric 8-bit: error <= scale/2 per element
        assert (err <= s / 2 + 1e-7).all()

    def test_quant_error_scales_with_amplitude(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((4, 24)).astype(np.float32) * 100.0
        w = rng.standard_normal((24, 24)).astype(np.float32)
        w_i8, w_s = quantize_weight(w)
        got = np.asarray(dense_w8a8(jnp.asarray(x), jnp.asarray(w_i8),
                                    jnp.asarray(w_s)))
        want = x @ w
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 0.02


class TestWeightOnlyPrimitives:
    def test_dense_w8a16_matches_numpy(self):
        """Weight-only: x @ dequant(w) + b exactly (f32 compute, no act quant)."""
        rng = np.random.default_rng(5)
        x = rng.standard_normal((5, 37, 24)).astype(np.float32)
        w = rng.standard_normal((24, 48)).astype(np.float32)
        b = rng.standard_normal((48,)).astype(np.float32)
        w_i8, w_s = quantize_weight(w)
        got = np.asarray(
            jax.jit(dense_w8a16)(jnp.asarray(x), jnp.asarray(w_i8),
                                 jnp.asarray(w_s), jnp.asarray(b))
        )
        want = x @ (w_i8.astype(np.float32) * w_s) + b
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_w8a16_error_strictly_tighter_than_w8a8(self):
        """No activation quantization => error <= the W8A8 error on the
        same weights (this is the entire point of the knob)."""
        rng = np.random.default_rng(6)
        x = rng.standard_normal((64, 128)).astype(np.float32)
        w = rng.standard_normal((128, 96)).astype(np.float32)
        w_i8, w_s = quantize_weight(w)
        want = x @ w
        err16 = np.abs(np.asarray(
            dense_w8a16(jnp.asarray(x), jnp.asarray(w_i8), jnp.asarray(w_s))
        ) - want).max()
        err8 = np.abs(np.asarray(
            dense_w8a8(jnp.asarray(x), jnp.asarray(w_i8), jnp.asarray(w_s))
        ) - want).max()
        assert err16 < err8
        assert err16 / np.abs(want).max() < 0.01


class TestQuantTower:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = OwlViTDetector(TINY, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((2, 8), jnp.int32),
        )
        return model, variables

    def test_feature_cosine_vs_float(self, model_and_vars):
        model, variables = model_and_vars
        rng = np.random.default_rng(3)
        pixels = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        ref = model.apply(variables, pixels, method=OwlViTDetector.encode_image)
        qp = quantize_vision_tower(variables, TINY)
        got = jax.jit(
            lambda q, px: encode_image_int8(q, px, TINY, dtype=jnp.float32)
        )(qp, pixels)
        ref = np.asarray(ref).reshape(-1, TINY.vision.hidden_size)
        got = np.asarray(got).reshape(-1, TINY.vision.hidden_size)
        num = (ref * got).sum(-1)
        den = np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-9
        cos = num / den
        assert cos.min() > 0.98, f"min per-patch cosine {cos.min()}"

    def test_w8a16_drift_tighter_than_w8a8(self, model_and_vars):
        """Full-tower drift vs the float tower: weight-only must track at
        least as closely as W8A8 (per-patch cosine) and very tightly in
        absolute terms."""
        model, variables = model_and_vars
        rng = np.random.default_rng(7)
        pixels = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        ref = np.asarray(model.apply(
            variables, pixels, method=OwlViTDetector.encode_image
        )).reshape(-1, TINY.vision.hidden_size)
        qp = quantize_vision_tower(variables, TINY)

        def cos_min(weight_only):
            got = np.asarray(encode_image_int8(
                qp, pixels, TINY, dtype=jnp.float32, weight_only=weight_only
            )).reshape(-1, TINY.vision.hidden_size)
            num = (ref * got).sum(-1)
            den = np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1)
            return (num / (den + 1e-9)).min()

        c16, c8 = cos_min(True), cos_min(False)
        assert c16 >= c8 - 1e-4, (c16, c8)
        assert c16 > 0.995, c16

    def test_detection_scores_track_float(self, model_and_vars):
        model, variables = model_and_vars
        rng = np.random.default_rng(4)
        pixels = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        queries = model.apply(
            variables, jnp.asarray(rng.integers(1, 99, (3, 8)), dtype=jnp.int32),
            None, method=OwlViTDetector.encode_text,
        )
        feats_f = model.apply(variables, pixels, method=OwlViTDetector.encode_image)
        qp = quantize_vision_tower(variables, TINY)
        feats_q = encode_image_int8(qp, pixels, TINY, dtype=jnp.float32)
        logits_f, boxes_f = model.apply(
            variables, feats_f, queries, None, method=OwlViTDetector.predict
        )
        logits_q, boxes_q = model.apply(
            variables, feats_q, queries, None, method=OwlViTDetector.predict
        )
        # logits live in a sigmoid(logit) score space; absolute drift bound
        assert np.abs(np.asarray(logits_f) - np.asarray(logits_q)).max() < 0.35
        assert np.abs(np.asarray(boxes_f) - np.asarray(boxes_q)).max() < 0.05
        # score ordering over patches is what drives the search splat
        sf = np.asarray(jax.nn.sigmoid(logits_f.max(-1))).ravel()
        sq = np.asarray(jax.nn.sigmoid(logits_q.max(-1))).ravel()
        assert np.corrcoef(sf, sq)[0, 1] > 0.99


class TestQuantScorer:
    @pytest.fixture(scope="class")
    def quant_scorer(self):
        cfg = SearchConfig(search_budget=0.5, detector_quant="int8")
        model = OwlViTDetector(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        n_valid = 150
        n_pad = cfg.padded_frames(n_valid)
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
            model, variables, cache, ["couch"], ["tv"], tok, cfg
        )
        state = init_state(n_valid, 1, cfg, jax.random.key(1), n_pad=n_pad)
        return scorer, state, cfg, n_valid

    def test_builds_qvision(self, quant_scorer):
        scorer, *_ = quant_scorer
        assert scorer.qvision is not None
        lyr = scorer.qvision["layers"][0]
        assert lyr["qkv"]["w"].dtype == jnp.int8
        assert lyr["qkv"]["w"].shape == (32, 96)   # fused (D, 3D)
        assert lyr["fc1"]["w"].dtype == jnp.int8

    def test_weight_views_cached_across_scorers(self):
        """Per-video build_scorer calls with shared weights must not
        re-quantize the tower (the batched runner builds one scorer per
        video)."""
        cfg = SearchConfig(search_budget=0.5, detector_quant="int8")
        model = OwlViTDetector(TINY, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((2, 8), jnp.int32),
        )
        tok = HashTokenizer(vocab_size=100, context=8)
        cache = jnp.zeros((128, 20, 40, 3), jnp.uint8)
        s1 = make_owlvit_scorer(model, variables, cache, ["a"], [], tok, cfg)
        s2 = make_owlvit_scorer(model, variables, cache, ["b"], ["c"], tok, cfg)
        assert s1.qvision is s2.qvision

    def test_rejects_unknown_quant(self):
        cfg = SearchConfig(detector_quant="int4")
        model = OwlViTDetector(TINY, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((2, 8), jnp.int32),
        )
        tok = HashTokenizer(vocab_size=100, context=8)
        cache = jnp.zeros((128, 20, 40, 3), jnp.uint8)
        with pytest.raises(ValueError, match="detector_quant"):
            make_owlvit_scorer(model, variables, cache, ["a"], [], tok, cfg)

    def test_full_search_runs(self, quant_scorer):
        scorer, state, cfg, n_valid = quant_scorer
        final, secs = jax.jit(run_search, static_argnums=2)(state, scorer, cfg)
        secs = np.asarray(secs)
        assert secs.shape == (cfg.search_nframes,)
        assert (secs >= 0).all() and (secs < n_valid).all()
        assert len(np.unique(secs)) == cfg.search_nframes
        assert np.isfinite(np.asarray(final.P)).all()

    def test_full_search_runs_w8a16(self):
        cfg = SearchConfig(search_budget=0.5, detector_quant="w8a16")
        model = OwlViTDetector(TINY, dtype=jnp.float32)
        rng = np.random.default_rng(8)
        n_valid = 150
        n_pad = cfg.padded_frames(n_valid)
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
            model, variables, cache, ["couch"], ["tv"], tok, cfg
        )
        assert scorer.qvision is not None   # same int8 pytree as W8A8
        state = init_state(n_valid, 1, cfg, jax.random.key(1), n_pad=n_pad)
        final, secs = jax.jit(run_search, static_argnums=2)(state, scorer, cfg)
        secs = np.asarray(secs)
        assert secs.shape == (cfg.search_nframes,)
        assert len(np.unique(secs)) == cfg.search_nframes
        assert np.isfinite(np.asarray(final.P)).all()

    def test_batched_step_shares_qvision(self, quant_scorer):
        from tstar_tpu.parallel.batched import batched_search_step, stack_scorers

        scorer, state, cfg, n_valid = quant_scorer
        batched = stack_scorers([scorer, scorer], cfg)
        assert batched.qvision is scorer.qvision
        states = jax.tree_util.tree_map(
            lambda x: jnp.stack([x, x]), state
        )
        out = jax.jit(batched_search_step, static_argnums=2)(
            states, batched, cfg
        )
        assert out.scores.shape == (2, state.scores.shape[0])
        assert bool(jnp.isfinite(out.P).all())
