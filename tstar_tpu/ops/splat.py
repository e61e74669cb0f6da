"""Detection→cell splatting and the windowed score update.

Two pieces of the reference's score bookkeeping, reformulated as fixed-shape
scatter ops:

* ``splat_detections_to_cells`` — map detector boxes onto the R x C frame grid
  by box center, taking the per-cell max of weighted confidences and a
  per-cell per-class presence mask (reference
  ``TStar/interface_searcher.py:94-155``: weight lookup, center->cell,
  cell-max merge; class presence feeds target verification ``:382-420``).

* ``window_splat`` — propagate each top-quartile frame's score to its +-W
  neighbours with 1/(|offset|+1) decay, max-merged (reference
  ``interface_searcher.py:215-241``).  The reference loop is order-dependent:
  a frame's splat reads its *current* score, which an earlier frame in the
  same batch may already have raised.  We reproduce that exactly with a
  ``fori_loop`` over the (at most R*C) sampled frames.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def splat_detections_to_cells(
    boxes_xyxy: jax.Array,      # (Q, 4) in image pixel coords
    scores: jax.Array,          # (Q,) raw detector confidences (post-sigmoid)
    class_ids: jax.Array,       # (Q,) int
    keep: jax.Array,            # (Q,) bool: detection survives the threshold
    class_weights: jax.Array,   # (C,) weight per text prompt (target 1.0 / cue 0.5)
    grid_shape: Tuple[int, int],
    image_hw: Tuple[int, int],
    num_classes: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (conf_map (R, C), presence (R*C, num_classes) bool)."""
    rows, cols = grid_shape
    img_h, img_w = image_hw
    cell_w = img_w / cols
    cell_h = img_h / rows

    cx = (boxes_xyxy[:, 0] + boxes_xyxy[:, 2]) * 0.5
    cy = (boxes_xyxy[:, 1] + boxes_xyxy[:, 3]) * 0.5
    gx = jnp.clip(jnp.floor(cx / cell_w).astype(jnp.int32), 0, cols - 1)
    gy = jnp.clip(jnp.floor(cy / cell_h).astype(jnp.int32), 0, rows - 1)
    cell = gy * cols + gx

    adjusted = scores * class_weights[class_ids]
    # conf map init is 0 and adjusted >= 0, so masking dropped detections to 0
    # makes them no-ops under scatter-max (interface_searcher.py:130,149).
    vals = jnp.where(keep, adjusted, 0.0).astype(scores.dtype)
    conf_flat = jnp.zeros((rows * cols,), scores.dtype).at[cell].max(vals)

    presence = jnp.zeros((rows * cols, num_classes), jnp.bool_)
    presence = presence.at[cell, class_ids].max(keep)
    return conf_flat.reshape(rows, cols), presence


def window_splat_literal(
    score_distribution: jax.Array,   # (N_pad,) per-second scores
    sampled_secs: jax.Array,         # (K,) int sampled frame seconds
    is_top: jax.Array,               # (K,) bool: frame in the top quartile
    n_valid: jax.Array,              # scalar int: true video length in seconds
    window_size: int = 5,
) -> jax.Array:
    """Literal transcription of the reference loop: K sequential full-array
    scatter-max updates.  Kept as the semantic oracle for ``window_splat``."""
    offsets = jnp.arange(-window_size, window_size + 1, dtype=jnp.int32)
    decay = 1.0 / (jnp.abs(offsets).astype(score_distribution.dtype) + 1.0)
    neg_inf = jnp.asarray(-jnp.inf, score_distribution.dtype)

    def body(k, scores):
        sec = sampled_secs[k]
        center = scores[sec]            # fresh read: order dependence preserved
        idxs = sec + offsets
        in_range = (idxs >= 0) & (idxs < n_valid)
        vals = jnp.where(in_range, center * decay, neg_inf)
        updated = scores.at[idxs].max(vals, mode="drop")
        return jnp.where(is_top[k], updated, scores)

    k_total = sampled_secs.shape[0]
    return jax.lax.fori_loop(0, k_total, body, score_distribution)


def window_splat(
    score_distribution: jax.Array,   # (N_pad,) per-second scores
    sampled_secs: jax.Array,         # (K,) int sampled frame seconds
    is_top: jax.Array,               # (K,) bool: frame in the top quartile
    n_valid: jax.Array,              # scalar int: true video length in seconds
    window_size: int = 5,
) -> jax.Array:
    """Windowed max-splat, exactly equivalent to the reference's sequential
    loop but TPU-fast.

    Key observation: the only values the sequential loop ever READS back are
    the sampled frames' own center scores — a top frame's splat can raise a
    later top frame's center (when their seconds are within the window), and
    that raised value then propagates.  So the order dependence reduces to a
    K-step recurrence over the K center values

        c_k = max(scores[sec_k], max_{j<k, top_j} c_j / (|sec_k - sec_j| + 1))

    after which every contribution ``c_k / (|off|+1)`` max-merges into the
    score array in ONE batched scatter (max is associative, so merge order
    does not matter).  This replaces K dependent full-array updates with a
    tiny K-step scalar recurrence + one scatter; equivalence to the literal
    loop is tested in tests/test_ops.py.
    """
    dtype = score_distribution.dtype
    k_total = sampled_secs.shape[0]
    offsets = jnp.arange(-window_size, window_size + 1, dtype=jnp.int32)
    decay = 1.0 / (jnp.abs(offsets).astype(dtype) + 1.0)

    base_centers = score_distribution[sampled_secs]              # (K,)
    dist = jnp.abs(sampled_secs[:, None] - sampled_secs[None, :])  # (K, K)
    cross_decay = 1.0 / (dist.astype(dtype) + 1.0)
    in_window = dist <= window_size

    def body(k, centers):
        # contributions from earlier top frames within the window
        earlier = (jnp.arange(k_total) < k) & is_top & in_window[k]
        raised = jnp.max(
            jnp.where(earlier, centers * cross_decay[k], -jnp.inf)
        )
        c_k = jnp.maximum(centers[k], raised)
        return centers.at[k].set(c_k)

    centers = jax.lax.fori_loop(0, k_total, body, base_centers)

    idxs = sampled_secs[:, None] + offsets[None, :]              # (K, W)
    vals = centers[:, None] * decay[None, :]
    ok = is_top[:, None] & (idxs >= 0) & (idxs < n_valid)
    vals = jnp.where(ok, vals, -jnp.inf)
    return score_distribution.at[idxs.reshape(-1)].max(
        vals.reshape(-1), mode="drop"
    )
