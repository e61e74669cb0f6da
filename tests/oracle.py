"""Sequential NumPy oracle of the T* search algorithm.

An independent, host-side re-derivation of the reference search semantics
(``/root/reference/TStar/interface_searcher.py``), written to be obviously
correct rather than fast.  The JAX engine must match it seed-for-seed: both
consume identical Gumbel noise (generated from the same ``jax.random`` key
schedule), so sampled indices, visited masks, window splats, verification
decisions, and final keyframes are directly comparable.

The smoother is injected (the engine's own ``smoothing_spline_distribution``
by default) so this oracle isolates control flow and update ordering; the
smoother itself is validated separately in ``tests/test_smoother.py``.

All arithmetic is float32 to match on-device precision.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import numpy as np

F32 = np.float32


def percentile_linear_f32(values: np.ndarray, q: float) -> F32:
    """np.percentile 'linear' interpolation computed in float32."""
    s = np.sort(values.astype(F32))
    pos = (len(s) - 1) * (q / 100.0)
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    frac = F32(pos - lo)
    return F32(s[lo] * (F32(1.0) - frac) + s[hi] * frac)


@dataclasses.dataclass
class OracleTables:
    """Per-second detector behaviour (same tables drive the TableScorer)."""

    grid_conf: np.ndarray        # (N,) float32
    grid_presence: np.ndarray    # (N, C) bool
    verify_conf: np.ndarray      # (N,) float32
    verify_presence: np.ndarray  # (N, C) bool


@dataclasses.dataclass
class OracleResult:
    scores: np.ndarray
    visited: np.ndarray
    P: np.ndarray
    remaining: np.ndarray
    iterations: int
    sampled_history: List[np.ndarray]
    pop_secs: np.ndarray


def run_oracle(
    n_valid: int,
    n_targets: int,
    tables: OracleTables,
    config,
    gumbel_fn: Callable[[int], np.ndarray],
    pop_gumbel_fn: Callable[[], np.ndarray],
    smoother_fn: Callable[[np.ndarray, np.ndarray, int], np.ndarray],
) -> OracleResult:
    """Run the full search sequentially.

    Args:
        gumbel_fn: iteration -> Gumbel noise over N_pad entries (must mirror
            the engine's key schedule).
        pop_gumbel_fn: Gumbel noise for the final pop draw.
        smoother_fn: (scores, visited_mask, n_valid) -> P over N_pad.
    """
    k = config.frames_per_iteration
    n_pad = len(tables.grid_conf)
    t_max = config.max_targets

    scores = np.zeros(n_pad, F32)
    scores[:n_valid] = F32(config.score_init)
    visited = np.ones(n_pad, bool)
    visited[:n_valid] = False
    p = np.zeros(n_pad, F32)
    p[:n_valid] = F32(config.confidence_threshold * config.p_init_scale)
    remaining = np.zeros(t_max, bool)
    remaining[:n_targets] = True
    budget = int(min(config.budget_cap, np.float32(n_valid) * config.search_budget))

    valid = np.zeros(n_pad, bool)
    valid[:n_valid] = True

    iteration = 0
    sampled_history: List[np.ndarray] = []

    while remaining.any() and budget > 0:
        # --- sampling ---
        # The engine splits its PRNG key every iteration regardless of which
        # branch runs; consume the schedule unconditionally to stay in sync.
        g = np.asarray(gumbel_fn(iteration), F32)
        if iteration == 0:
            secs = np.arange(k, dtype=np.int64) * (n_valid // k)
        else:
            bonus = F32(k) / F32(n_valid)
            p_bonus = ((p + bonus) * valid.astype(F32)).astype(F32)
            weights = (p_bonus * (~visited).astype(F32)).astype(F32)
            thr = percentile_linear_f32(weights[valid], config.top_percentile)
            masked = (weights * (weights >= thr)).astype(F32)
            if masked.sum(dtype=F32) == 0 or int((masked > 0).sum()) < k:
                masked = p_bonus
            with np.errstate(divide="ignore"):
                keys = np.where(masked > 0, np.log(masked, dtype=F32), -np.inf) + g
            secs = np.argsort(-keys, kind="stable")[:k]
        sampled_history.append(np.asarray(secs))
        budget -= k

        # --- grid scoring + raw writes ---
        conf = tables.grid_conf[secs].astype(F32)
        presence = tables.grid_presence[secs]
        scores[secs] = conf
        visited[secs] = True

        # --- top-quartile windowed splat (order dependent) ---
        thr_c = percentile_linear_f32(conf, config.top_percentile)
        is_top = conf >= thr_c
        w = config.window_size
        for kk in range(k):
            if not is_top[kk]:
                continue
            sec = int(secs[kk])
            center = scores[sec]
            for off in range(-w, w + 1):
                j = sec + off
                if 0 <= j < n_valid:
                    scores[j] = max(scores[j], F32(center / F32(abs(off) + 1)))

        # --- distribution refit (before verification) ---
        p = np.asarray(smoother_fn(scores, visited, n_valid), F32)

        # --- verification (sequential over frames; <=1 removal each) ---
        for kk in range(k):
            sec = int(secs[kk])
            in_cell = presence[kk, :t_max] & remaining
            if not in_cell.any():
                continue
            vconf = F32(tables.verify_conf[sec])
            vpres = tables.verify_presence[sec, :t_max]
            scores[sec] = vconf
            passing = in_cell & vpres & (vconf > F32(config.confidence_threshold))
            if passing.any():
                remaining[int(np.argmax(passing))] = False

        iteration += 1

    # --- final pop ---
    weights = (scores * valid.astype(F32)).astype(F32)
    g = np.asarray(pop_gumbel_fn(), F32)
    with np.errstate(divide="ignore"):
        keys = np.where(weights > 0, np.log(weights, dtype=F32), -np.inf) + g
    pop = np.sort(np.argsort(-keys, kind="stable")[: config.search_nframes])

    return OracleResult(
        scores=scores,
        visited=visited,
        P=p,
        remaining=remaining,
        iterations=iteration,
        sampled_history=sampled_history,
        pop_secs=pop,
    )


def make_synthetic_tables(
    n_pad: int,
    n_valid: int,
    n_classes: int,
    n_targets: int,
    seed: int,
    event_density: float = 0.03,
    verify_boost: float = 0.25,
) -> OracleTables:
    """Deterministic pseudo-detector: sparse object 'events' along the video."""
    rng = np.random.default_rng(seed)
    grid_conf = (rng.random(n_pad, dtype=np.float32) * 0.15).astype(F32)
    grid_presence = np.zeros((n_pad, n_classes), bool)
    verify_conf = np.zeros(n_pad, F32)
    verify_presence = np.zeros((n_pad, n_classes), bool)

    n_events = max(1, int(n_valid * event_density))
    event_secs = rng.choice(n_valid, size=n_events, replace=False)
    for sec in event_secs:
        cls = int(rng.integers(0, n_classes))
        strength = F32(0.4 + 0.6 * rng.random())
        grid_conf[sec] = max(grid_conf[sec], strength)
        grid_presence[sec, cls] = True
        verify_presence[sec, cls] = rng.random() < 0.8
        verify_conf[sec] = F32(min(1.0, strength + verify_boost * rng.random()))

    # Ensure at least one target is actually findable.
    sec = int(event_secs[0])
    grid_presence[sec, 0] = True
    verify_presence[sec, 0] = True
    grid_conf[sec] = F32(0.9)
    verify_conf[sec] = F32(0.95)

    grid_conf[n_valid:] = 0
    verify_conf[n_valid:] = 0
    grid_presence[n_valid:] = False
    verify_presence[n_valid:] = False
    return OracleTables(grid_conf, grid_presence, verify_conf, verify_presence)
