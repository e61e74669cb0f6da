"""Frame-index sampling for the T* search loop — TPU-native formulations.

The reference draws frames with ``np.random.choice(N, K, replace=False, p=_P)``
(reference ``TStar/interface_searcher.py:353-358``) and the final keyframes the
same way (``:369-373``).  Sequential sampling-without-replacement from a
categorical distribution is distributionally identical to the Gumbel-top-k
trick (add i.i.d. Gumbel noise to the log-weights and take the K largest),
which maps onto TPU as one fused ``top_k`` with no data-dependent control
flow.  ``tests/test_sampling.py`` carries a statistical equivalence check.

The first iteration uses deterministic uniform-stride sampling
(``interface_searcher.py:339-343``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def uniform_stride_indices(total_frames: int | jax.Array, k: int) -> jax.Array:
    """First-iteration uniform sampling: ``arange(0, N, N // K)[:K]``.

    For N >= K this equals ``arange(K) * (N // K)`` exactly
    (interface_searcher.py:339-343; the short-video append branch there is
    unreachable for N >= K, and N < K is rejected upstream).
    """
    interval = jnp.asarray(total_frames, jnp.int32) // k
    return jnp.arange(k, dtype=jnp.int32) * interval


def gumbel_topk_without_replacement(
    key: jax.Array,
    weights: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Draw ``k`` distinct indices ~ categorical(weights) without replacement.

    Equivalent in distribution to ``np.random.choice(n, k, replace=False,
    p=weights/weights.sum())``.  Zero-weight entries are never selected as
    long as at least ``k`` entries have positive weight (the caller guards
    this, mirroring interface_searcher.py:349-351).

    Args:
        key: PRNG key.
        weights: 1-D nonnegative weights (need not be normalized).
        k: number of draws (static).

    Returns:
        (indices, gumbel_keys) — indices of the k draws in decreasing
        perturbed-key order, and the full perturbed-key vector (useful for
        testing / replay).
    """
    logw = jnp.where(weights > 0, jnp.log(weights), -jnp.inf)
    g = jax.random.gumbel(key, shape=weights.shape, dtype=weights.dtype)
    keys = logw + g
    _, idx = jax.lax.top_k(keys, k)
    return idx.astype(jnp.int32), keys


def topk_indices(weights: jax.Array, k: int) -> jax.Array:
    """Deterministic alternative: the k highest-weight indices.

    Mirrors the eval-side sampler ``np.argsort(-dist)[:k]``
    (LVHaystackBench/val_qa_results.py:106) and serves as the reproducible
    ``deterministic_pop`` mode of the engine.
    """
    _, idx = jax.lax.top_k(weights, k)
    return idx.astype(jnp.int32)
