"""Search state as a fixed-shape JAX pytree.

The reference keeps mutable NumPy arrays plus Python lists on the searcher
object (reference ``TStar/interface_searcher.py:69-82``: ``score_distribution``,
``non_visiting_frames``, ``P``, ``remaining_targets``, ``search_budget``).
Here the same state is a frozen dataclass of arrays with static shapes so an
entire search runs inside one ``lax.while_loop`` — the video length ``N``
(seconds at 1 fps) is padded to a lane multiple and carried as ``n_valid``,
and the remaining-targets list becomes a boolean mask over target slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tstar_tpu.utils.config import SearchConfig


@struct.dataclass
class SearchState:
    scores: jax.Array      # (N_pad,) f32 per-second score (init 1e-6 on valid)
    visited: jax.Array     # (N_pad,) bool; padding counts as visited
    P: jax.Array           # (N_pad,) f32 sampling distribution
    remaining: jax.Array   # (T_max,) bool remaining-target mask
    budget: jax.Array      # i32 scored-frame budget left
    n_valid: jax.Array     # i32 true number of 1-fps seconds
    iteration: jax.Array   # i32 completed search iterations
    rng: jax.Array         # PRNG key

    @property
    def valid(self) -> jax.Array:
        return jnp.arange(self.scores.shape[0]) < self.n_valid


def init_state(
    n_valid: int | jax.Array,
    n_targets: int | jax.Array,
    config: SearchConfig,
    rng: jax.Array,
    n_pad: int | None = None,
) -> SearchState:
    """Initial state mirroring interface_searcher.py:69-75.

    scores = 1e-6, non_visiting = 1 (here: visited = False), P = 0.3 * conf.
    """
    if n_pad is None:
        n_pad = config.padded_frames(int(n_valid))
    n_valid = jnp.asarray(n_valid, jnp.int32)
    valid = jnp.arange(n_pad) < n_valid
    scores = jnp.where(valid, config.score_init, 0.0).astype(jnp.float32)
    p0 = config.confidence_threshold * config.p_init_scale
    p = jnp.where(valid, p0, 0.0).astype(jnp.float32)
    remaining = jnp.arange(config.max_targets) < jnp.asarray(n_targets, jnp.int32)
    budget = jnp.minimum(
        jnp.asarray(config.budget_cap, jnp.int32),
        (n_valid.astype(jnp.float32) * config.search_budget).astype(jnp.int32),
    )
    return SearchState(
        scores=scores,
        visited=~valid,
        P=p,
        remaining=remaining,
        budget=budget,
        n_valid=n_valid,
        iteration=jnp.asarray(0, jnp.int32),
        rng=rng,
    )
