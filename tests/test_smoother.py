"""Smoother validation: exact banded-solve checks + scipy spline parity.

The engine replaces scipy ``UnivariateSpline(visited, scores, s=0.5)``
(reference interface_searcher.py:265) with a residual-targeted discrete
smoothing spline (see ops/smoother.py).  Tests here check:

1. the pentadiagonal LDL^T solver against dense numpy solves (tight);
2. the lambda-selection rule against an independent dense reimplementation;
3. downstream parity with the scipy-based distribution on realistic search
   snapshots (rank correlation + mass-overlap, the quantities the sampler
   actually consumes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.interpolate
import scipy.stats

from tstar_tpu.ops.smoother import (
    _penta_diagonals,
    _penta_solve_batch,
    _penta_solve_cr,
    fit_smoother,
    smoothing_spline_distribution,
)


def dense_from_diagonals(d0, d1, d2):
    n = len(d0)
    a = np.diag(d0)
    a += np.diag(d1[: n - 1], 1) + np.diag(d1[: n - 1], -1)
    a += np.diag(d2[: n - 2], 2) + np.diag(d2[: n - 2], -2)
    return a


def second_difference_gram(n):
    d = np.zeros((n - 2, n))
    for j in range(n - 2):
        d[j, j : j + 3] = [1.0, -2.0, 1.0]
    return d.T @ d


class TestPentaDiagonals:
    @pytest.mark.parametrize("n_valid", [4, 5, 16, 100])
    def test_matches_dense_gram(self, n_valid):
        n_pad = 128
        d0, d1, d2 = _penta_diagonals(n_pad, jnp.asarray(n_valid), jnp.float32)
        want = second_difference_gram(n_valid)
        got = dense_from_diagonals(
            np.asarray(d0)[:n_valid], np.asarray(d1)[:n_valid], np.asarray(d2)[:n_valid]
        )
        np.testing.assert_allclose(got, want, atol=1e-6)
        # no coupling into the padded region
        assert np.asarray(d1)[n_valid - 1 :].sum() == 0
        assert np.asarray(d2)[max(0, n_valid - 2) :].sum() == 0


class TestPentaSolve:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("n", [8, 64, 257])
    def test_matches_dense_solve(self, seed, n):
        rng = np.random.default_rng(seed)
        # SPD pentadiagonal: W + lam * D^T D with random positive weights.
        w = rng.random(n) + 0.1
        lam = 10.0 ** rng.uniform(-2, 2)
        a = np.diag(w) + lam * second_difference_gram(n)
        b = rng.standard_normal(n)
        want = np.linalg.solve(a, b)

        d0 = np.diag(a).astype(np.float32)
        d1 = np.append(np.diag(a, 1), 0).astype(np.float32)
        d2 = np.append(np.diag(a, 2), [0, 0]).astype(np.float32)
        got = np.asarray(
            _penta_solve_batch(
                jnp.asarray(d0)[:, None], jnp.asarray(d1)[:, None],
                jnp.asarray(d2)[:, None], jnp.asarray(b, dtype=jnp.float32)[:, None],
            )
        )[:, 0]
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


class TestPentaSolveCyclicReduction:
    """The production block-CR solver against dense solves and the scan
    LDL^T oracle (the solver it replaced, VERDICT r2 item 1)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("n", [8, 64, 256, 384])
    def test_matches_dense_solve(self, seed, n):
        rng = np.random.default_rng(seed)
        w = rng.random(n) + 0.1
        lam = 10.0 ** rng.uniform(-2, 2)
        a = np.diag(w) + lam * second_difference_gram(n)
        b = rng.standard_normal(n)
        want = np.linalg.solve(a, b)

        d0 = np.diag(a).astype(np.float32)
        d1 = np.append(np.diag(a, 1), 0).astype(np.float32)
        d2 = np.append(np.diag(a, 2), [0, 0]).astype(np.float32)
        got = np.asarray(
            _penta_solve_cr(
                jnp.asarray(d0)[:, None], jnp.asarray(d1)[:, None],
                jnp.asarray(d2)[:, None], jnp.asarray(b, dtype=jnp.float32)[:, None],
            )
        )[:, 0]
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("n", [128, 384])
    def test_matches_scan_ldlt_across_lam_sweep(self, seed, n):
        """CR == scan-LDL^T on realistic smoother systems over the FULL
        log-lam sweep range (the exact batched systems _sweep builds)."""
        rng = np.random.default_rng(seed)
        w = (rng.random(n) < 0.25).astype(np.float32)  # sparse visit weights
        y = rng.random(n).astype(np.float32) * 0.5
        lams = np.power(10.0, np.linspace(-5, 5, 41)).astype(np.float32)
        p0, p1, p2 = (
            np.asarray(x)
            for x in _penta_diagonals(n, jnp.asarray(n), jnp.float32)
        )
        d0 = w[:, None] + lams[None, :] * p0[:, None]
        inactive = (w == 0) & (p0 == 0)
        d0 = np.where(inactive[:, None], 1.0, d0)
        d1 = lams[None, :] * p1[:, None]
        d2 = lams[None, :] * p2[:, None]
        b = (w * y)[:, None] * np.ones_like(lams)[None, :]
        args = [jnp.asarray(v, dtype=jnp.float32) for v in (d0, d1, d2, b)]
        got = np.asarray(_penta_solve_cr(*args))
        want = np.asarray(_penta_solve_batch(*args))
        # Relative-to-scale comparison.  Both solvers run in float32 on
        # systems whose conditioning grows with lam; at lam=1e5 BOTH sit
        # ~1.5e-2 from the float64 dense truth (measured: CR 1.5e-2 vs LDL
        # 1.4e-2 max-abs at lam 10^4.5, CR tighter below 10^3), so agreement
        # between them is bounded by that shared conditioning floor, not by
        # either algorithm.
        scale = np.maximum(np.abs(want).max(axis=0, keepdims=True), 1e-3)
        np.testing.assert_allclose(got / scale, want / scale, atol=6e-2)
        # and tightly in the well-conditioned range (lam <= 1e2: cols 0..28)
        np.testing.assert_allclose(
            got[:, :29] / scale[:, :29], want[:, :29] / scale[:, :29], atol=2e-3
        )

    def test_vmappable(self):
        """The batched multi-video path vmaps the whole smoother."""
        rng = np.random.default_rng(0)
        n, bsz = 64, 3
        w = rng.random((bsz, n)).astype(np.float32) + 0.1
        g = second_difference_gram(n)
        b = rng.standard_normal((bsz, n)).astype(np.float32)
        d0 = (w + np.diag(g)[None, :]).astype(np.float32)
        d1 = np.broadcast_to(np.append(np.diag(g, 1), 0), (bsz, n)).astype(np.float32)
        d2 = np.broadcast_to(np.append(np.diag(g, 2), [0, 0]), (bsz, n)).astype(np.float32)

        out = jax.vmap(
            lambda a0, a1, a2, rhs: _penta_solve_cr(
                a0[:, None], a1[:, None], a2[:, None], rhs[:, None]
            )[:, 0]
        )(*[jnp.asarray(v) for v in (d0, d1, d2, b)])
        for i in range(bsz):
            a = np.diag(w[i]) + g
            np.testing.assert_allclose(
                np.asarray(out[i]), np.linalg.solve(a, b[i]), rtol=2e-3, atol=2e-4
            )


def _search_snapshot(n, n_visited, seed):
    """A realistic mid-search state: sparse visits, a few confident peaks."""
    rng = np.random.default_rng(seed)
    visited_idx = np.sort(rng.choice(n, size=n_visited, replace=False))
    scores = np.full(n, 1e-6, np.float32)
    obs = rng.random(n_visited).astype(np.float32) * 0.2
    peaks = rng.random(n_visited) < 0.2
    obs[peaks] = 0.5 + 0.5 * rng.random(peaks.sum()).astype(np.float32)
    scores[visited_idx] = obs
    visited = np.zeros(n, bool)
    visited[visited_idx] = True
    return scores, visited, visited_idx, obs


class TestFitSmoother:
    def test_residual_within_target(self):
        n, n_pad = 300, 384
        scores, visited, *_ = _search_snapshot(n, 64, 3)
        y = np.zeros(n_pad, np.float32)
        y[:n] = scores
        w = np.zeros(n_pad, np.float32)
        w[:n][visited] = 1.0
        fitted, log_lam = fit_smoother(
            jnp.asarray(y), jnp.asarray(w), jnp.asarray(n), smoothing=0.5
        )
        resid = float(np.sum(w * (np.asarray(fitted) - y) ** 2))
        assert resid <= 0.5 + 1e-3
        # and it actually uses the budget: the next-coarser lambda overshoots
        # unless the fit is already maximally smooth.
        assert float(log_lam) >= -5.0

    def test_padding_stays_zero(self):
        n, n_pad = 100, 128
        scores, visited, *_ = _search_snapshot(n, 32, 0)
        y = np.zeros(n_pad, np.float32)
        y[:n] = scores
        w = np.zeros(n_pad, np.float32)
        w[:n][visited] = 1.0
        fitted, _ = fit_smoother(jnp.asarray(y), jnp.asarray(w), jnp.asarray(n))
        np.testing.assert_allclose(np.asarray(fitted)[n:], 0.0, atol=1e-7)


def scipy_reference_distribution(scores, visited, n):
    """The reference's smoother->distribution path, via scipy.

    Mirrors interface_searcher.py:260-274 semantics.
    """
    idx = np.nonzero(visited[:n])[0]
    if len(idx) == 0:
        return np.ones(n) / n
    spline = scipy.interpolate.UnivariateSpline(idx, scores[idx], s=0.5)
    vals = spline(np.arange(n))
    adjusted = np.maximum(1.0 / n, vals)
    p = 1.0 / (1.0 + np.exp(-adjusted))
    return p / p.sum()


class TestDistributionParityWithScipy:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_rank_correlation_and_mass_overlap(self, seed):
        n, n_pad = 400, 512
        scores, visited, *_ = _search_snapshot(n, 80, seed)
        y = np.zeros(n_pad, np.float32)
        y[:n] = scores
        vis = np.ones(n_pad, bool)
        vis[:n] = visited

        ours = np.asarray(
            smoothing_spline_distribution(
                jnp.asarray(y), jnp.asarray(vis), jnp.arange(n_pad) < n, jnp.asarray(n)
            )
        )[:n]
        ref = scipy_reference_distribution(scores, visited, n)

        # The sampler consumes the top-quartile mass of P (the quartile mask
        # in interface_searcher.py:346-348), so top-quartile membership is the
        # quantity that must agree.  Note FITPACK's free-knot spline *rings*
        # hard at sparse-data tails (fitted values of +-100s on [0,1] data,
        # observed on these snapshots); our smoother is intentionally
        # oscillation-free, so pointwise correlation is only moderate while
        # the sampled region agrees closely.
        top_ours = set(np.argsort(-ours)[: n // 4].tolist())
        top_ref = set(np.argsort(-ref)[: n // 4].tolist())
        overlap = len(top_ours & top_ref) / (n // 4)
        assert overlap > 0.8, f"top-quartile overlap {overlap}"

        corr = scipy.stats.spearmanr(ours, ref).statistic
        assert corr > 0.7, f"rank correlation {corr}"

    def test_uniform_when_unvisited(self):
        n, n_pad = 100, 128
        y = np.full(n_pad, 1e-6, np.float32)
        vis = np.zeros(n_pad, bool)
        p = np.asarray(
            smoothing_spline_distribution(
                jnp.asarray(y), jnp.asarray(vis), jnp.arange(n_pad) < n, jnp.asarray(n)
            )
        )
        np.testing.assert_allclose(p[:n], 1.0 / n, atol=1e-7)
        np.testing.assert_allclose(p[n:], 0.0, atol=1e-7)

    def test_normalized(self):
        n, n_pad = 300, 384
        scores, visited, *_ = _search_snapshot(n, 48, 7)
        y = np.zeros(n_pad, np.float32)
        y[:n] = scores
        vis = np.ones(n_pad, bool)
        vis[:n] = visited
        p = np.asarray(
            smoothing_spline_distribution(
                jnp.asarray(y), jnp.asarray(vis), jnp.arange(n_pad) < n, jnp.asarray(n)
            )
        )
        assert p.sum() == pytest.approx(1.0, abs=1e-5)
        assert (p[:n] > 0).all()
