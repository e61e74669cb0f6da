"""Unit tests for the core search ops against NumPy ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.ops.percentile import masked_percentile
from tstar_tpu.ops.sampling import (
    gumbel_topk_without_replacement,
    uniform_stride_indices,
    topk_indices,
)
from tstar_tpu.ops.splat import (
    splat_detections_to_cells,
    window_splat,
    window_splat_literal,
)


class TestMaskedPercentile:
    @pytest.mark.parametrize("n_valid", [5, 16, 97, 128])
    @pytest.mark.parametrize("q", [25.0, 50.0, 75.0, 90.0])
    def test_matches_numpy(self, n_valid, q):
        rng = np.random.default_rng(n_valid * 100 + int(q))
        x = np.zeros(128, np.float32)
        x[:n_valid] = rng.random(n_valid, dtype=np.float32)
        valid = np.arange(128) < n_valid
        got = float(masked_percentile(jnp.asarray(x), q, jnp.asarray(valid)))
        want = float(np.percentile(x[:n_valid].astype(np.float64), q))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-6)

    def test_with_zeros_and_ties(self):
        x = np.array([0, 0, 0, 0, 1, 1, 2, 3] + [9] * 8, np.float32)
        valid = np.arange(16) < 8
        got = float(masked_percentile(jnp.asarray(x), 75.0, jnp.asarray(valid)))
        assert got == pytest.approx(np.percentile(x[:8], 75.0))


class TestUniformStride:
    @pytest.mark.parametrize("n,k", [(100, 16), (16, 16), (1000, 16), (37, 8)])
    def test_matches_reference_formula(self, n, k):
        # Reference: arange(0, N, N // K)[:K]  (interface_searcher.py:339-343)
        interval = n // k
        want = np.arange(0, n, interval)[:k]
        got = np.asarray(uniform_stride_indices(n, k))
        np.testing.assert_array_equal(got, want)


class TestGumbelTopK:
    def test_zero_weights_never_selected(self):
        w = jnp.array([0.0, 1.0, 0.0, 2.0, 3.0, 0.0, 4.0, 5.0])
        for seed in range(20):
            idx, _ = gumbel_topk_without_replacement(jax.random.key(seed), w, 5)
            assert set(np.asarray(idx).tolist()) <= {1, 3, 4, 6, 7}

    def test_distribution_matches_choice_without_replacement(self):
        # Inclusion frequency of each index across many draws must match
        # np.random.choice(replace=False, p=...) — the Gumbel-top-k trick is
        # distributionally identical to sequential categorical sampling
        # without replacement.
        n, k, trials = 6, 3, 30000
        p = np.array([0.05, 0.1, 0.15, 0.2, 0.2, 0.3])
        keys = jax.random.split(jax.random.key(0), trials)
        draw = jax.jit(
            jax.vmap(
                lambda key: gumbel_topk_without_replacement(key, jnp.asarray(p), k)[0]
            )
        )
        ours = np.asarray(draw(keys))
        ours_incl = np.bincount(ours.ravel(), minlength=n) / trials

        rng = np.random.default_rng(0)
        ref = np.stack(
            [rng.choice(n, size=k, replace=False, p=p) for _ in range(trials)]
        )
        ref_incl = np.bincount(ref.ravel(), minlength=n) / trials
        np.testing.assert_allclose(ours_incl, ref_incl, atol=0.015)

    def test_topk_deterministic(self):
        w = jnp.array([0.1, 0.9, 0.5, 0.7, 0.0])
        np.testing.assert_array_equal(np.asarray(topk_indices(w, 3)), [1, 3, 2])


class TestSplatDetections:
    def test_center_to_cell_max_merge(self):
        # 2x2 grid over a 100x200 image; cells are 100w x 50h.
        boxes = jnp.array(
            [
                [0, 0, 50, 40],      # center (25, 20)  -> cell (0, 0)
                [10, 5, 60, 45],     # center (35, 25)  -> cell (0, 0) too
                [150, 60, 190, 90],  # center (170, 75) -> cell (1, 1)
                [90, 10, 130, 30],   # center (110, 20) -> cell (0, 1)
                [0, 0, 10, 10],      # dropped by keep mask
            ],
            jnp.float32,
        )
        scores = jnp.array([0.8, 0.6, 0.5, 0.9, 0.99], jnp.float32)
        class_ids = jnp.array([0, 1, 2, 1, 0])
        keep = jnp.array([True, True, True, True, False])
        weights = jnp.array([1.0, 0.5, 0.5, 0.5], jnp.float32)  # tgt, cue, cue, pad
        conf, presence = splat_detections_to_cells(
            boxes, scores, class_ids, keep, weights,
            grid_shape=(2, 2), image_hw=(100, 200), num_classes=4,
        )
        # cell (0,0): max(0.8*1.0, 0.6*0.5) = 0.8
        np.testing.assert_allclose(
            np.asarray(conf), [[0.8, 0.45], [0.0, 0.25]], atol=1e-6
        )
        presence = np.asarray(presence)
        assert presence[0, 0] and presence[0, 1]      # classes 0,1 in cell 0
        assert presence[1, 1] and not presence[1, 0]  # class 1 in cell (0,1)
        assert presence[3, 2]                         # class 2 in cell (1,1)
        assert not presence[2].any()                  # nothing in cell (1,0)

    def test_clipping_to_grid_edges(self):
        boxes = jnp.array([[195, 95, 205, 105]], jnp.float32)  # center off-image
        conf, _ = splat_detections_to_cells(
            boxes, jnp.array([1.0], jnp.float32), jnp.array([0]),
            jnp.array([True]), jnp.array([1.0], jnp.float32),
            grid_shape=(2, 2), image_hw=(100, 200), num_classes=1,
        )
        assert np.asarray(conf)[1, 1] == 1.0


class TestWindowSplat:
    def _numpy_reference(self, scores, secs, is_top, n_valid, w):
        scores = scores.copy()
        for k in range(len(secs)):
            if not is_top[k]:
                continue
            sec = int(secs[k])
            center = scores[sec]
            for off in range(-w, w + 1):
                j = sec + off
                if 0 <= j < n_valid:
                    scores[j] = max(scores[j], np.float32(center / (abs(off) + 1)))
        return scores

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_sequential_reference(self, seed):
        rng = np.random.default_rng(seed)
        n_valid, n_pad, k = 100, 128, 16
        scores = np.zeros(n_pad, np.float32)
        scores[:n_valid] = rng.random(n_valid, dtype=np.float32)
        secs = rng.choice(n_valid, size=k, replace=False)
        is_top = rng.random(k) < 0.4
        want = self._numpy_reference(scores, secs, is_top, n_valid, 5)
        got = np.asarray(
            window_splat(
                jnp.asarray(scores), jnp.asarray(secs), jnp.asarray(is_top),
                jnp.asarray(n_valid), window_size=5,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_order_dependence_preserved(self):
        # Frame B sits inside frame A's window; A raises B's score before B
        # splats, so B propagates its *raised* value — the reference's
        # sequential semantics (interface_searcher.py:234-241).
        n = 128
        scores = np.zeros(n, np.float32)
        scores[10] = 1.0
        scores[12] = 0.01
        secs = jnp.array([10, 12])
        is_top = jnp.array([True, True])
        got = np.asarray(window_splat(jnp.asarray(scores), secs, is_top, jnp.asarray(n)))
        # A(10) raises B(12): 1.0/3 -> B splats 1/3 to 17: (1/3)/6
        assert got[12] == pytest.approx(1.0 / 3.0)
        assert got[17] == pytest.approx((1.0 / 3.0) / 6.0)

    @pytest.mark.parametrize("seed", range(6))
    def test_fast_equals_literal(self, seed):
        # The optimized recurrence+scatter form must match the literal
        # sequential loop bit-for-bit, including overlapping-window order
        # effects (adjacent sampled seconds forced below).
        rng = np.random.default_rng(seed)
        n_valid, n_pad, k = 60, 128, 16
        scores = np.zeros(n_pad, np.float32)
        scores[:n_valid] = rng.random(n_valid, dtype=np.float32)
        secs = rng.choice(n_valid, size=k, replace=False)  # dense -> overlaps
        is_top = rng.random(k) < 0.5
        a = window_splat(
            jnp.asarray(scores), jnp.asarray(secs), jnp.asarray(is_top),
            jnp.asarray(n_valid),
        )
        b = window_splat_literal(
            jnp.asarray(scores), jnp.asarray(secs), jnp.asarray(is_top),
            jnp.asarray(n_valid),
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_boundary_clipping(self):
        n_pad, n_valid = 128, 100
        scores = np.zeros(n_pad, np.float32)
        scores[99] = 1.0
        got = np.asarray(
            window_splat(
                jnp.asarray(scores), jnp.array([99]), jnp.array([True]),
                jnp.asarray(n_valid),
            )
        )
        assert (got[n_valid:] == 0).all()  # never leaks into padding
        assert got[0] == 0
        assert got[98] == pytest.approx(0.5)
