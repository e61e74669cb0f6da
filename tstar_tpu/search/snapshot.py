"""SearchState snapshot / resume (SURVEY.md §5.4).

The reference's searcher state (``P``, ``score_distribution``,
``non_visiting_frames``, remaining targets, budget;
``TStar/interface_searcher.py:69-82``) is small and serializable; the
reference never persists it (a crashed video restarts from scratch).  Here a
state snapshots to a single ``.npz`` and resumes exactly — the PRNG key is
part of the state, so a resumed search continues the same stochastic
trajectory.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from tstar_tpu.search.state import SearchState


def save_state(state: SearchState, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.device_get(state)
    np.savez(
        path,
        scores=host.scores,
        visited=host.visited,
        P=host.P,
        remaining=host.remaining,
        budget=host.budget,
        n_valid=host.n_valid,
        iteration=host.iteration,
        rng=jax.random.key_data(host.rng),
    )
    return path


def load_state(path: str, device: Optional[jax.Device] = None) -> SearchState:
    import jax.numpy as jnp

    with np.load(path) as data:
        rng = jax.random.wrap_key_data(jnp.asarray(data["rng"]))
        state = SearchState(
            scores=jnp.asarray(data["scores"]),
            visited=jnp.asarray(data["visited"]),
            P=jnp.asarray(data["P"]),
            remaining=jnp.asarray(data["remaining"]),
            budget=jnp.asarray(data["budget"]),
            n_valid=jnp.asarray(data["n_valid"]),
            iteration=jnp.asarray(data["iteration"]),
            rng=rng,
        )
    if device is not None:
        state = jax.device_put(state, device)
    return state
