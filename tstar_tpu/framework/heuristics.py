"""Detector backend registry: string name -> scorer factory.

Counterpart of the reference's ``initialize_heuristic``
(``TStar/TStarFramework.py:171-187``: 'owl-vit' -> OWLInterface,
'yolo-World' -> YoloWorldInterface, else NotImplementedError).  A backend
here is an object that, given a device frame cache and the grounded objects,
builds a jittable ``Scorer`` for the search engine — the equivalent of the
reference's ``reparameterize_object_list`` + detector binding
(interface_searcher.py:85-91).

Backends:
  * ``owl-vit``        — Flax OWL-ViT from a local HF checkpoint directory.
  * ``owl-vit-random`` — same architecture, random weights (benchmarks /
                         smoke tests; no checkpoint needed).
  * ``color-probe``    — weight-free detector that scores frames by colored-
                         region matching; the hermetic end-to-end backend for
                         synthetic fixture videos (plays the role the fake
                         LlavaInterface plays for the reference's grounder).
  * ``yolo-world``     — text-conditioned YOLO-class detector from a
                         checkpoint (mmdet/mmyolo .pth via the converter in
                         models/yolo_loader.py, or a native Flax checkpoint).
  * ``yolo-world-random`` — same architecture, random weights.

``owl-vit`` / ``yolo-world`` WITHOUT a checkpoint_dir raise ValueError: the
reference always loads real weights (TStarFramework.py:175-185), so running
random weights must be an explicit opt-in via the ``-random`` names.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Protocol, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tstar_tpu.search.scorers import Scorer, TableScorer
from tstar_tpu.utils.config import SearchConfig

logger = logging.getLogger(__name__)


class HeuristicBackend(Protocol):
    name: str

    def build_scorer(
        self,
        cache: jax.Array,            # (N_pad, ch, cw, 3) uint8
        target_objects: Sequence[str],
        cue_objects: Sequence[str],
        config: SearchConfig,
    ) -> Scorer: ...


class _DetectorCompatMixin:
    """Reference-compatible detector surface (interface_heuristic.py):
    ``reparameterize_object_list`` / ``inference_detector`` /
    ``bbox_visualization`` / ``texts`` — for users porting code that drives
    the detector directly rather than through the search engine."""

    texts: list = []

    def reparameterize_object_list(self, target_objects, cue_objects):
        """Set the text prompts (interface_heuristic.py:78-93,268-280)."""
        combined = list(target_objects) + list(cue_objects)
        self.texts = [[obj.strip()] for obj in combined] + [[" "]]
        self._compat_targets = list(target_objects)
        self._compat_cues = list(cue_objects)

    def inference_detector(self, images, score_threshold: float = 0.005, **kw):
        """Detect on a batch of HWC uint8 images -> list of detection dicts
        {"xyxy", "confidence", "class_id"} (numpy), one per image."""
        import jax.numpy as jnp
        import numpy as np

        from tstar_tpu.kernels.image import bilinear_resize, normalize_clip
        from tstar_tpu.models.owlvit import OwlViTDetector, postprocess_detections

        if not getattr(self, "texts", None):
            raise RuntimeError("call reparameterize_object_list first")
        ids, mask = self.tokenizer.encode_batch([t[0] for t in self.texts])
        queries = self.model.apply(
            self.variables, jnp.asarray(ids), jnp.asarray(mask),
            method=OwlViTDetector.encode_text,
        )
        size = self.model.cfg.vision.image_size
        out = []
        for image in images:
            image = np.asarray(image)
            px = normalize_clip(
                bilinear_resize(jnp.asarray(image), (size, size)),
                self.model.dtype,
            )[None]
            feats = self.model.apply(
                self.variables, px, method=OwlViTDetector.encode_image
            )
            logits, boxes = self.model.apply(
                self.variables, feats, queries, None, method=OwlViTDetector.predict
            )
            scores, cls, xyxy = postprocess_detections(
                logits, boxes, image.shape[:2]
            )
            keep = np.asarray(scores[0]) > score_threshold
            out.append(
                {
                    "xyxy": np.asarray(xyxy[0])[keep],
                    "confidence": np.asarray(scores[0])[keep],
                    "class_id": np.asarray(cls[0])[keep],
                }
            )
        self.detections_inbatch = out
        return out

    def inference(self, image_path: str, score_threshold: float = 0.3, **kw):
        """Path-based single-image detection (interface_heuristic.py:217-230)."""
        from PIL import Image
        import numpy as np

        with Image.open(image_path) as im:
            image = np.asarray(im.convert("RGB"))
        return self.inference_detector([image], score_threshold=score_threshold)[0]

    def bbox_visualization(self, images, detections_inbatch):
        """Annotated copies of the images (interface_heuristic.py:259-267)."""
        from tstar_tpu.viz.boxes import draw_boxes

        out = []
        for image, det in zip(images, detections_inbatch):
            labels = [
                f"{self.texts[c][0]} {s:.2f}"
                for c, s in zip(det["class_id"], det["confidence"])
                if c < len(self.texts)
            ]
            out.append(
                draw_boxes(image, det["xyxy"], labels=labels, class_ids=det["class_id"])
            )
        return out


class OwlVitHeuristic(_DetectorCompatMixin):
    """Flax OWL-ViT backend (reference default, TStarFramework.py:175-179)."""

    def __init__(self, checkpoint_dir: Optional[str] = None, dtype=None, seed: int = 0):
        import jax.numpy as jnp

        from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32

        self.name = "owl-vit" if checkpoint_dir else "owl-vit-random"
        dtype = dtype if dtype is not None else jnp.bfloat16
        if checkpoint_dir:
            from tstar_tpu.models.loader import load_owlvit_checkpoint

            self.model, self.variables, self.tokenizer = load_owlvit_checkpoint(
                checkpoint_dir, dtype=dtype
            )
        else:
            from tstar_tpu.models.clip_tokenizer import HashTokenizer

            cfg = owlvit_base_patch32()
            self.model = OwlViTDetector(cfg, dtype=dtype)
            self.variables = self.model.init(
                jax.random.key(seed),
                jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3), dtype),
                jnp.zeros((2, cfg.text.max_length), jnp.int32),
            )
            self.tokenizer = HashTokenizer(
                vocab_size=cfg.text.vocab_size, context=cfg.text.max_length
            )

    def build_scorer(self, cache, target_objects, cue_objects, config):
        from tstar_tpu.search.detector_scorer import make_owlvit_scorer

        return make_owlvit_scorer(
            self.model, self.variables, cache,
            target_objects, cue_objects, self.tokenizer, config,
        )


# Default palette for synthetic fixtures (video/synthetic.py default_scene).
DEFAULT_COLOR_MAP: Dict[str, Tuple[int, int, int]] = {
    "couch": (200, 40, 40),
    "tv": (40, 40, 200),
    "chair": (40, 200, 40),
    "table": (200, 200, 40),
    "person": (200, 40, 200),
    "lamp": (40, 200, 200),
}


class ColorProbeHeuristic:
    """Weight-free detector: confidence = colored-region coverage per frame.

    For each object name with a known color, a frame's confidence is the
    fraction of pixels within tolerance of that color, scaled into a
    detector-like confidence.  Produces per-second tables consumed via
    ``TableScorer`` so the search runs exactly as with a real detector.
    """

    def __init__(
        self,
        color_map: Optional[Dict[str, Tuple[int, int, int]]] = None,
        tolerance: float = 40.0,
        gain: float = 30.0,
        presence_threshold: float = 0.05,
    ):
        self.name = "color-probe"
        self.color_map = dict(DEFAULT_COLOR_MAP if color_map is None else color_map)
        self.tolerance = tolerance
        self.gain = gain
        self.presence_threshold = presence_threshold

    def build_scorer(self, cache, target_objects, cue_objects, config):
        names = list(target_objects) + list(cue_objects)
        q = config.max_objects
        colors = np.zeros((q, 3), np.float32)
        active = np.zeros((q,), bool)
        for i, n in enumerate(names):
            if n in self.color_map:
                colors[i] = self.color_map[n]
                active[i] = True
            else:
                logger.warning("color-probe: no color registered for %r", n)
        weights = np.full((q,), config.cue_weight, np.float32)
        weights[: len(target_objects)] = config.target_weight

        colors_j = jnp.asarray(colors)

        def per_frame(frame):  # (h, w, 3) uint8 -> (Q,) coverage
            d = jnp.linalg.norm(
                frame.astype(jnp.float32)[:, :, None, :] - colors_j[None, None],
                axis=-1,
            )
            return jnp.mean((d < self.tolerance).astype(jnp.float32), axis=(0, 1))

        # Chunked map keeps peak memory at (chunk, h, w, Q) instead of
        # materializing the full (N, h, w, Q) distance tensor.
        coverage = jax.lax.map(per_frame, cache, batch_size=32)  # (N, Q)
        raw_conf = jnp.clip(coverage * self.gain, 0.0, 1.0) * jnp.asarray(active)
        presence = raw_conf > self.presence_threshold  # (N, Q)
        weighted = raw_conf * jnp.asarray(weights)[None]
        conf = jnp.max(
            jnp.where(presence, weighted, 0.0), axis=-1
        )  # cell-max of weighted confidences, like the splat
        return TableScorer(
            grid_conf=conf,
            grid_presence=presence,
            verify_conf=conf,
            verify_presence=presence,
        )


def initialize_heuristic(
    heuristic_type: str = "owl-vit", **kwargs
) -> HeuristicBackend:
    """String dispatch, extending TStarFramework.py:171-187."""
    name = heuristic_type.lower()
    if name in ("owl-vit", "owlv2", "owl-v2"):
        # OWLv2 checkpoints load through the same backend (models/owlvit.py
        # converter auto-detects the owlv2. prefix).
        ckpt = kwargs.get("checkpoint_dir")
        if not ckpt:
            # The reference always loads real weights here
            # (TStarFramework.py:175-179, from_pretrained); silently running
            # random weights would return garbage keyframes with no error.
            raise ValueError(
                "initialize_heuristic('owl-vit') requires checkpoint_dir= "
                "(a local HF OWL-ViT checkpoint directory). For benchmarks/"
                "smoke tests that don't need real weights, ask explicitly "
                "for initialize_heuristic('owl-vit-random')."
            )
        return OwlVitHeuristic(checkpoint_dir=ckpt)
    if name == "owl-vit-random":
        return OwlVitHeuristic(checkpoint_dir=None, seed=kwargs.get("seed", 0))
    if name in ("color-probe", "fake"):
        return ColorProbeHeuristic(color_map=kwargs.get("color_map"))
    if name in ("yolo-world", "yolo-world-v2"):
        ckpt = kwargs.get("checkpoint_dir")
        if not ckpt:
            # Same loud-failure contract as owl-vit: the reference's
            # yolo-World branch always loads a checkpoint
            # (TStarFramework.py:180-185, init_detector(cfg, ckpt)).
            raise ValueError(
                "initialize_heuristic('yolo-world') requires checkpoint_dir= "
                "(an mmdet/mmyolo YOLO-World .pth or a native Flax "
                "checkpoint directory). For random-weight runs ask "
                "explicitly for initialize_heuristic('yolo-world-random')."
            )
        return YoloWorldHeuristic(
            checkpoint_dir=ckpt,
            size=kwargs.get("size", "xl"),
            seed=kwargs.get("seed", 0),
        )
    if name == "yolo-world-random":
        return YoloWorldHeuristic(
            checkpoint_dir=None,
            size=kwargs.get("size", "xl"),
            seed=kwargs.get("seed", 0),
        )
    raise NotImplementedError(f"Heuristic type '{heuristic_type}' is not implemented.")


class YoloWorldHeuristic(_DetectorCompatMixin):
    """YOLO-World v2 backend (reference TStarFramework.py:180-185).

    ``checkpoint_dir`` may contain either
      * an mmdet/mmyolo YOLO-World ``.pth`` (the reference's checkpoint
        format, e.g. ``yolo_world_v2_xl_obj365v1_goldg_cc3mlite_pretrain-
        5daf1395.pth``) plus CLIP tokenizer files (vocab.json/merges.txt) —
        converted tensor-for-tensor by models/yolo_loader.py; or
      * native Flax checkpoints (models/loader.save_flax_params format).
    Random init (the explicit ``yolo-world-random`` name) serves benchmarks
    and interface tests.
    """

    def __init__(self, checkpoint_dir: Optional[str] = None, size: str = "xl", seed: int = 0):
        import jax as _jax
        import jax.numpy as jnp

        from tstar_tpu.models.clip_tokenizer import HashTokenizer
        from tstar_tpu.models.owlvit import TextConfig
        from tstar_tpu.models.yoloworld import (
            YoloTextEncoder,
            YoloWorldDetector,
            yoloworld_small,
            yoloworld_xl,
        )

        self.name = "yolo-world"
        if size not in ("xl", "small"):
            raise ValueError(f"unknown yolo-world size {size!r}; choose xl | small")
        if checkpoint_dir:
            from tstar_tpu.models.yolo_loader import load_yolo_world_checkpoint

            (self.model, self.variables, self.text_model, self.text_variables,
             self.tokenizer) = load_yolo_world_checkpoint(
                checkpoint_dir, size=size, dtype=jnp.bfloat16
            )
        else:
            cfg = yoloworld_small() if size == "small" else yoloworld_xl()
            # CLIP-base text tower at the model's text width (the real tower
            # is hidden 512 / proj 512; tiny dims for the small variant).
            text_cfg = TextConfig(
                hidden_size=cfg.text_dim,
                num_layers=2 if size == "small" else 12,
                num_heads=4 if size == "small" else 8,
                intermediate_size=4 * cfg.text_dim,
            )
            self.model = YoloWorldDetector(cfg, dtype=jnp.bfloat16)
            self.text_model = YoloTextEncoder(
                text_cfg, projection_dim=cfg.text_dim, dtype=jnp.bfloat16
            )
            size_px = cfg.image_size
            self.variables = self.model.init(
                _jax.random.key(seed),
                jnp.zeros((1, size_px, size_px, 3), jnp.bfloat16),
                jnp.zeros((2, cfg.text_dim), jnp.bfloat16),
            )
            self.text_variables = self.text_model.init(
                _jax.random.key(seed + 1),
                jnp.zeros((2, text_cfg.max_length), jnp.int32),
                jnp.ones((2, text_cfg.max_length), jnp.int32),
            )
            self.tokenizer = HashTokenizer(
                vocab_size=text_cfg.vocab_size, context=text_cfg.max_length
            )

    def build_scorer(self, cache, target_objects, cue_objects, config):
        import jax.numpy as jnp

        from tstar_tpu.search.detector_scorer import build_prompt_batch
        from tstar_tpu.search.yolo_scorer import YoloWorldScorer

        ids_pad, mask_pad, weights = build_prompt_batch(
            target_objects, cue_objects, self.tokenizer, config
        )
        # YoloTextEncoder already projects + L2-normalizes
        # (HuggingCLIPLanguageBackbone.forward_text).
        text_embeds = self.text_model.apply(
            self.text_variables, jnp.asarray(ids_pad), jnp.asarray(mask_pad)
        )
        return YoloWorldScorer(
            cache=cache,
            variables=self.variables,
            text_embeds=text_embeds.astype(jnp.float32),
            query_mask=jnp.asarray(ids_pad[:, 0] > 0),
            class_weights=jnp.asarray(weights),
            model=self.model,
            config=config,
        )

    # -- reference-compatible detector surface: reparameterize_object_list
    # and bbox_visualization come from _DetectorCompatMixin; only the
    # detection forward differs from the OWL backend. ----------------------
    def _encode_texts(self):
        import jax.numpy as jnp

        if not getattr(self, "texts", None):
            raise RuntimeError("call reparameterize_object_list first")
        ids, mask = self.tokenizer.encode_batch([t[0] for t in self.texts])
        return self.text_model.apply(
            self.text_variables, jnp.asarray(ids), jnp.asarray(mask)
        )

    def inference_detector(self, images, score_threshold: float = 0.12,
                           max_dets: int = 50, **kw):
        """Batch detection -> list of {"xyxy", "confidence", "class_id"}
        (reference search-path defaults: threshold 0.12, max 50,
        interface_heuristic.py:136-168)."""
        import jax.numpy as jnp
        import numpy as np

        from tstar_tpu.kernels.image import bilinear_resize
        from tstar_tpu.models.yoloworld import postprocess_yolo

        text_embeds = self._encode_texts()
        size = self.model.cfg.image_size
        out = []
        for image in images:
            image = np.asarray(image)
            px = (bilinear_resize(jnp.asarray(image), (size, size)) / 255.0)[None]
            logits, boxes = self.model.apply(
                self.variables, px.astype(self.model.dtype), text_embeds
            )
            scores, cls, xyxy, keep = postprocess_yolo(
                logits, boxes, None, score_threshold=score_threshold,
                nms_iou=self.model.cfg.nms_iou, max_dets=max_dets,
            )
            k = np.asarray(keep[0])
            # detector coords are on the size x size canvas; map back and
            # clip to the image (mmdet clamps boxes in _bbox_post_process)
            h, w = image.shape[:2]
            scale = np.asarray([w / size, h / size, w / size, h / size])
            boxes_img = np.clip(
                np.asarray(xyxy[0])[k] * scale,
                0.0, np.asarray([w, h, w, h], np.float64),
            )
            out.append({
                "xyxy": boxes_img,
                "confidence": np.asarray(scores[0])[k],
                "class_id": np.asarray(cls[0])[k],
            })
        self.detections_inbatch = out
        return out

    def inference(self, image_path: str, score_threshold: float = 0.3,
                  max_dets: int = 100, **kw):
        """Path-based single-image detection (reference defaults 0.3/100,
        interface_heuristic.py:96-134)."""
        import numpy as np
        from PIL import Image

        with Image.open(image_path) as im:
            image = np.asarray(im.convert("RGB"))
        return self.inference_detector(
            [image], score_threshold=score_threshold, max_dets=max_dets
        )[0]
