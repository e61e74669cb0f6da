"""Reference-fidelity verification path: replay equivalence + A/B harness.

When the host verify path is fed the SAME cache frames the engine's
device verify reads, the two searches must match bit-for-bit — proving the
host replay of engine._apply_verification (rescore-overwrite, slot-order
single removal, evolving remaining) is semantically exact.  The raw-decode
mode (reference chain: re-decode + 600x285, interface_searcher.py:401-405)
then measures the actual fidelity drift.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.framework.heuristics import OwlVitHeuristic
from tstar_tpu.models.clip_tokenizer import HashTokenizer
from tstar_tpu.models.owlvit import OwlViTConfig, OwlViTDetector, TextConfig, VisionConfig
from tstar_tpu.search.engine import run_search_chained
from tstar_tpu.search.reference_verify import (
    make_raw_frame_source,
    run_search_reference_verify,
)
from tstar_tpu.search.state import init_state
from tstar_tpu.utils.config import SearchConfig
from tstar_tpu.video.cache import build_frame_cache
from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

cv2 = pytest.importorskip("cv2")

TINY = OwlViTConfig(
    vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                        intermediate_size=64, patch_size=16, image_size=64),
    text=TextConfig(vocab_size=100, hidden_size=24, num_layers=2, num_heads=4,
                    intermediate_size=48, max_length=8),
    projection_dim=24,
)


def _tiny_heuristic():
    h = OwlVitHeuristic.__new__(OwlVitHeuristic)
    h.name = "owl-vit-tiny"
    h.model = OwlViTDetector(TINY, dtype=jnp.float32)
    h.variables = h.model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((2, 8), jnp.int32)
    )
    h.tokenizer = HashTokenizer(vocab_size=100, context=8)
    return h


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("rv")
    path = str(d / "v.mp4")
    write_synthetic_video(
        path, duration_sec=60.0, fps=10.0, hw=(48, 64),
        objects=[PlantedObject("couch", (20.0, 26.0), (200, 40, 40),
                               (0.5, 0.5), 0.4)],
    )
    cfg = SearchConfig(search_budget=1.0, cache_hw=(32, 64),
                       confidence_threshold=0.2)
    cache = build_frame_cache(path, cfg)
    heuristic = _tiny_heuristic()
    scorer = heuristic.build_scorer(cache.frames, ["couch"], ["tv"], cfg)
    return path, cfg, cache, scorer


class TestReplayEquivalence:
    def test_cache_frame_source_matches_engine_exactly(self, setup):
        path, cfg, cache, scorer = setup
        cache_np = np.asarray(cache.frames)

        def cache_source(secs):
            return cache_np[np.asarray(secs, np.int64)]

        s0 = init_state(cache.n_valid, 1, cfg, jax.random.key(7),
                        n_pad=cache.n_pad)
        final_a, secs_a = run_search_chained(s0, scorer, cfg)
        final_b, secs_b, _ = run_search_reference_verify(
            s0, scorer, cfg, cache_source
        )
        np.testing.assert_array_equal(np.asarray(secs_a), np.asarray(secs_b))
        np.testing.assert_array_equal(
            np.asarray(final_a.remaining), np.asarray(final_b.remaining)
        )
        np.testing.assert_allclose(
            np.asarray(final_a.scores), np.asarray(final_b.scores), atol=1e-6
        )
        assert int(final_a.iteration) == int(final_b.iteration)

    def test_raw_decode_mode_runs(self, setup):
        path, cfg, cache, scorer = setup
        source = make_raw_frame_source(path, cfg)
        s0 = init_state(cache.n_valid, 1, cfg, jax.random.key(7),
                        n_pad=cache.n_pad)
        try:
            final, secs, decisions = run_search_reference_verify(
                s0, scorer, cfg, source, collect_decisions=True
            )
        finally:
            source.close()
        assert len(np.asarray(secs)) == cfg.search_nframes
        assert int(final.iteration) >= 1
        for d in decisions:
            assert set(d) == {"iteration", "sec", "vconf", "removed_slot"}
