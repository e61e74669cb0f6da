"""Scorer protocol: how the search engine asks a detector about frames.

The reference couples the algorithm to a detector through
``imageGridScoreFunction`` (grid image -> per-cell weighted confidences +
per-cell detected-object names, ``TStar/interface_searcher.py:94-155``) and a
per-frame verification rescore (``:382-420``).  Since each grid cell holds
exactly one sampled frame, the information the algorithm consumes per sampled
second reduces to:

    conf:     the cell's max weighted detector confidence
    presence: which text prompts (classes) were detected in the cell

A *scorer* provides that view behind two jittable methods, so the same engine
runs against a deterministic table (hermetic tests), a Flax OWL-ViT over an
HBM frame cache (production), or any future detector backend:

    score_grid(secs)   -> (conf (K,), presence (K, C) bool)   # grid pass
    score_verify(secs) -> (conf (K,), presence (K, C) bool)   # 1x1 rescore
"""

from __future__ import annotations

from typing import Protocol, Tuple

import jax
import jax.numpy as jnp
from flax import struct


class Scorer(Protocol):
    num_classes: int

    def score_grid(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array]: ...

    def score_verify(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array]: ...


@struct.dataclass
class TableScorer:
    """Deterministic scorer backed by precomputed per-second tables.

    Plays the role of the reference's only hermetic test double (the fake
    ``LlavaInterface``, interface_grounding.py:41-44) but for the detector:
    the search loop runs end-to-end with no weights, network, or pixels.
    """

    grid_conf: jax.Array        # (N_pad,) weighted max confidence per second
    grid_presence: jax.Array    # (N_pad, C) bool class presence per second
    verify_conf: jax.Array      # (N_pad,) verification-pass confidence
    verify_presence: jax.Array  # (N_pad, C) bool verification class presence

    @property
    def num_classes(self) -> int:
        return self.grid_presence.shape[-1]

    def score_grid(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self.grid_conf[secs], self.grid_presence[secs]

    def score_verify(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self.verify_conf[secs], self.verify_presence[secs]
