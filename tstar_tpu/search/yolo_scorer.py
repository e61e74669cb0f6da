"""Scorer backed by the YOLO-World-class detector over the frame cache.

Same role as ``OwlVitScorer`` (search/detector_scorer.py) with the YOLO
pipeline: 640px inputs in [0,1], contrastive text conditioning, and NMS'd
detections (score threshold 0.12, max 50, interface_heuristic.py:136-168)
splatted onto grid cells.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tstar_tpu.kernels.image import bilinear_resize, pack_grid
from tstar_tpu.models.yoloworld import YoloWorldDetector, postprocess_yolo
from tstar_tpu.ops.splat import splat_detections_to_cells
from tstar_tpu.utils.config import SearchConfig


@struct.dataclass
class YoloWorldScorer:
    cache: jax.Array          # (N_pad, ch, cw, 3) uint8
    variables: Any            # detector params
    text_embeds: jax.Array    # (Q, text_dim) precomputed CLIP text features
    query_mask: jax.Array     # (Q,) bool
    class_weights: jax.Array  # (Q,)
    model: YoloWorldDetector = struct.field(pytree_node=False)
    config: SearchConfig = struct.field(pytree_node=False)

    @property
    def num_classes(self) -> int:
        return self.text_embeds.shape[0]

    @property
    def detection_image_size(self) -> int:
        return self.model.cfg.image_size

    def _pixels_grid(self, secs: jax.Array) -> jax.Array:
        cfg = self.config
        size = self.model.cfg.image_size
        rows, cols = cfg.grid_rows, cfg.grid_cols
        cells = bilinear_resize(self.cache[secs], (size // rows, size // cols))
        return (pack_grid(cells, rows, cols) / 255.0)[None]

    def _detect(self, pixels: jax.Array):
        logits, boxes = self.model.apply(self.variables, pixels, self.text_embeds)
        c = self.model.cfg
        return postprocess_yolo(
            logits, boxes, self.query_mask,
            score_threshold=c.score_threshold, nms_iou=c.nms_iou,
            max_dets=c.max_dets,
        )

    def _score_grid_full(self, secs: jax.Array):
        cfg = self.config
        size = self.model.cfg.image_size
        scores, class_ids, boxes, keep = self._detect(self._pixels_grid(secs))
        conf_map, presence = splat_detections_to_cells(
            boxes[0], scores[0], class_ids[0], keep[0], self.class_weights,
            grid_shape=(cfg.grid_rows, cfg.grid_cols),
            image_hw=(size, size), num_classes=self.num_classes,
        )
        return conf_map.reshape(-1), presence, (scores[0], class_ids[0], boxes[0], keep[0])

    def score_grid(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        conf, presence, _ = self._score_grid_full(secs)
        return conf, presence

    def score_grid_detailed(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array, dict]:
        """score_grid + the NMS'd grid-image detections (see OwlVitScorer)."""
        conf, presence, (scores, class_ids, boxes, keep) = self._score_grid_full(secs)
        dets = {"scores": scores, "class_ids": class_ids, "boxes": boxes,
                "valid": keep}
        return conf, presence, dets

    def score_verify(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        size = self.model.cfg.image_size
        frames = bilinear_resize(self.cache[secs], (size, size)) / 255.0
        scores, class_ids, boxes, keep = self._detect(frames)

        def one(b, s, c, k):
            conf_map, presence = splat_detections_to_cells(
                b, s, c, k, self.class_weights,
                grid_shape=(1, 1), image_hw=(size, size),
                num_classes=self.num_classes,
            )
            return conf_map[0, 0], presence[0]

        return jax.vmap(one)(boxes, scores, class_ids, keep)
