"""Fixed-shape non-maximum suppression for TPU.

The reference's YOLO-World path relies on mmcv's CUDA NMS inside
``model.test_step`` (``TStar/interface_heuristic.py:136-168``); this is the
XLA-native equivalent (SURVEY.md §2.3): a greedy NMS expressed as a
fixed-length ``fori_loop`` over score-sorted candidates with masked IoU
suppression — no dynamic shapes, vmappable over batch and usable inside the
jitted search step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU matrix between two xyxy box sets: (N, 4) x (M, 4) -> (N, M)."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jax.Array,        # (N, 4) xyxy
    scores: jax.Array,       # (N,)
    iou_threshold: float | jax.Array = 0.7,
    max_outputs: int = 100,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS.  Returns (keep_indices (max_outputs,), valid (max_outputs,));
    invalid slots hold index 0.  Matches torchvision.ops.nms ordering."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    iou = box_iou(boxes_sorted, boxes_sorted)

    def body(i, alive):
        # if candidate i is still alive, kill all later boxes overlapping it
        suppress = (iou[i] > iou_threshold) & (jnp.arange(n) > i)
        return jnp.where(alive[i], alive & ~suppress, alive)

    alive = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))

    # Compact the survivors (score order) into a fixed-size output.
    rank = jnp.cumsum(alive) - 1
    keep_sorted = jnp.full((max_outputs,), n, jnp.int32)
    keep_sorted = keep_sorted.at[jnp.where(alive, rank, n)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    valid = keep_sorted < n
    keep = order[jnp.clip(keep_sorted, 0, n - 1)]
    return jnp.where(valid, keep, 0).astype(jnp.int32), valid


def batched_class_nms(
    boxes: jax.Array,        # (N, 4)
    scores: jax.Array,       # (N,)
    class_ids: jax.Array,    # (N,)
    iou_threshold: float = 0.7,
    max_outputs: int = 100,
) -> Tuple[jax.Array, jax.Array]:
    """Class-aware NMS via the coordinate-offset trick (torchvision
    batched_nms): boxes of different classes never overlap."""
    span = jnp.max(boxes) - jnp.min(boxes) + 1.0
    offset = class_ids.astype(boxes.dtype)[:, None] * span
    return nms(boxes + offset, scores, iou_threshold, max_outputs)
