"""Scorer backed by the Flax OWL-ViT over an HBM-resident frame cache.

This is the production counterpart of the reference's detector plumbing
(``TStar/interface_searcher.py:94-155`` imageGridScoreFunction over
``interface_heuristic.py:232-257`` OWLInterface.inference_detector): sampled
seconds are gathered from the device-resident 1-fps frame cache, packed into
one grid image, scored by a single batched OWL-ViT forward, and the
detections splatted back to per-frame confidences and class-presence masks —
entirely inside the jitted search step, zero host round-trips.

Text prompts are tokenized and encoded ONCE when the scorer is built
(mirroring ``reparameterize_object_list``, interface_searcher.py:87), then
reused every iteration.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tstar_tpu.kernels.image import build_detector_grid, build_verify_batch
from tstar_tpu.models.owlvit import OwlViTDetector, postprocess_detections
from tstar_tpu.ops.splat import splat_detections_to_cells
from tstar_tpu.utils.config import SearchConfig


def resolve_pallas_preprocess(
    config: SearchConfig, batched: bool = False
) -> SearchConfig:
    """Resolve ``use_pallas_preprocess=None`` (auto) to a concrete bool.

    Auto resolves to False: measured on a v5e (bench.py extra
    ``b1_frames_per_sec``, r2: XLA 679 vs Pallas 604 f/s end-to-end), the
    fused Pallas grid builder is SLOWER than the XLA gather+matmul-resize
    path — preprocessing is <1% of step FLOPs and the kernel's per-row
    DMA/matmul pipeline adds ~2.5 ms/step that XLA's fusion doesn't pay.
    The kernel stays available (bit-exact-tested) via an explicit
    ``use_pallas_preprocess=True`` for aligned caches on TPU.
    """
    import dataclasses

    if config.use_pallas_preprocess is not None:
        if config.use_pallas_preprocess and batched:
            # pallas_call batching under vmap is not exercised on the
            # remote-compile relay; fall back in the multi-video path.
            return dataclasses.replace(config, use_pallas_preprocess=False)
        return config
    return dataclasses.replace(config, use_pallas_preprocess=False)


@struct.dataclass
class OwlVitScorer:
    cache: jax.Array          # (N_pad, ch, cw, 3) uint8 1-fps frame cache
    variables: Any            # detector params pytree
    query_embeds: jax.Array   # (Q, proj_dim) precomputed text embeddings
    query_mask: jax.Array     # (Q,) bool: real prompts
    class_weights: jax.Array  # (Q,) f32: target 1.0 / cue 0.5 / pad 0.5
    model: OwlViTDetector = struct.field(pytree_node=False)
    config: SearchConfig = struct.field(pytree_node=False)
    # Int8-quantized vision tower (models/owlvit_quant.py), present iff
    # config.detector_quant == "int8"; shared across a video batch.
    qvision: Any = None
    # Reduced-resolution verification view (config.verify_image_size): the
    # same weights with a resampled position embedding (owlvit.resize_detector)
    # and, under int8, a matching quantized tower.  None = verify at native
    # size with the main model.
    verify_variables: Any = None
    qvision_verify: Any = None
    verify_model: Optional[OwlViTDetector] = struct.field(
        pytree_node=False, default=None
    )
    # Composed cache->patch-embedding projection (kernels/image.py
    # composed_patch_projection) — OPT-IN via TSTAR_COMPOSED_PATCH=1
    # (``grid_proj_opt_in``), measured e2e negative at the default geometry
    # (see _grid_projection).
    grid_proj_w: Optional[jax.Array] = None          # (s_h, s_w*3, D)
    grid_proj_b: Optional[jax.Array] = None          # (D,) f32
    grid_src_patch: Optional[Tuple[int, int]] = struct.field(
        pytree_node=False, default=None
    )
    grid_proj_opt_in: bool = struct.field(pytree_node=False, default=False)
    # Streaming-cache step buffer (video/cache.py StreamingFrameCache;
    # engine.run_search_streaming): when set, frame gathers read THIS
    # iteration's host-decoded frames instead of the device cache — the
    # cache field then holds only a (1, ch, cw, 3) dummy so multi-hour
    # videos never materialize in HBM.
    step_frames: Optional[jax.Array] = None      # (K, ch, cw, 3) uint8
    step_secs: Optional[jax.Array] = None        # (K,) int32
    # Folded resize+normalize matrices for the fused grid-embed Pallas path
    # (kernels/grid_embed.py — OPT-IN via TSTAR_GRID_EMBED=1; the r4 A/B
    # measured it e2e neutral, post-mortem in PERFORMANCE.md): width matrix
    # with CLIP affine + channel pad folded in, its bias row, and the
    # height matrix (None when identity).  Small, model-independent,
    # shared across a video batch.
    gb_awk: Optional[jax.Array] = None               # (cw*3, cell_w*c_pad)
    gb_bias: Optional[jax.Array] = None              # (cell_w*c_pad,)
    gb_ah: Optional[jax.Array] = None                # (cell_h, ch) | None

    @property
    def num_classes(self) -> int:
        # query_embeds is (Q, proj) single-video or (B, Q, proj) stacked
        return self.query_embeds.shape[-2]

    @property
    def detection_image_size(self) -> int:
        """Side of the square detector canvas the detection boxes live in."""
        return self.model.cfg.vision.image_size

    def _detect(
        self, pixels: jax.Array, model=None, variables=None, qvision=None,
        query_embeds=None, query_mask=None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        model = model or self.model
        variables = variables if variables is not None else self.variables
        qvision = qvision if qvision is not None else self.qvision
        query_embeds = (
            query_embeds if query_embeds is not None else self.query_embeds
        )
        query_mask = query_mask if query_mask is not None else self.query_mask
        if qvision is not None:
            from tstar_tpu.models.owlvit_quant import encode_image_int8

            feats = encode_image_int8(
                qvision, pixels, model.cfg, dtype=model.dtype,
                weight_only=self.config.detector_quant == "w8a16",
            )
        else:
            feats = model.apply(
                variables, pixels, method=OwlViTDetector.encode_image
            )
        logits, boxes = model.apply(
            variables, feats, query_embeds, query_mask,
            method=OwlViTDetector.predict,
        )
        size = model.cfg.vision.image_size
        return postprocess_detections(logits, boxes, (size, size))

    def _detect_embeds(
        self, patch_embeds: jax.Array, query_embeds=None, query_mask=None
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """_detect entered AFTER the patch-embedding matmul (the composed
        cache->embedding projection, kernels/image.grid_patch_embeddings)."""
        query_embeds = (
            query_embeds if query_embeds is not None else self.query_embeds
        )
        query_mask = query_mask if query_mask is not None else self.query_mask
        if self.qvision is not None:
            from tstar_tpu.models.owlvit_quant import encode_image_int8

            feats = encode_image_int8(
                self.qvision, None, self.model.cfg, dtype=self.model.dtype,
                patch_embeds=patch_embeds,
                weight_only=self.config.detector_quant == "w8a16",
            )
        else:
            feats = self.model.apply(
                self.variables, patch_embeds,
                method=OwlViTDetector.encode_patches,
            )
        logits, boxes = self.model.apply(
            self.variables, feats, query_embeds, query_mask,
            method=OwlViTDetector.predict,
        )
        size = self.model.cfg.vision.image_size
        return postprocess_detections(logits, boxes, (size, size))

    def _grid_embeds(self, cache: jax.Array, secs: jax.Array) -> jax.Array:
        from tstar_tpu.kernels.image import grid_patch_embeddings

        cfg = self.config
        return grid_patch_embeddings(
            cache, secs,
            self.grid_proj_w.reshape(-1, self.grid_proj_w.shape[-1]),
            self.grid_proj_b,
            (cfg.grid_rows, cfg.grid_cols), self.grid_src_patch,
            dtype=self.model.dtype,
        )

    def _use_grid_embed_kernel(self, cache_shape) -> bool:
        from tstar_tpu.kernels.grid_embed import use_grid_embed_kernel

        if self.gb_awk is None or self.config.use_pallas_preprocess:
            return False
        c = self.model.cfg.vision
        return use_grid_embed_kernel(
            cache_shape, c.image_size, c.patch_size, c.hidden_size,
            self.config,
        )

    def _grid_embeds_kernel(self, cache: jax.Array, secs: jax.Array):
        """Fused cache->embedding Pallas path (kernels/grid_embed.py);
        cache (B, N, ch, cw, 3), secs (B, K) -> (B, P, D)."""
        from tstar_tpu.kernels.grid_embed import (
            grid_cell_embed,
            grid_embed_interpret,
        )

        cfg = self.config
        c = self.model.cfg.vision
        patch_kernel = (
            self.variables["params"]["vision"]["patch_embedding"]["kernel"]
        )
        return grid_cell_embed(
            cache, secs, self.gb_awk, self.gb_bias, self.gb_ah, patch_kernel,
            grid_shape=(cfg.grid_rows, cfg.grid_cols),
            cell_hw=(
                c.image_size // cfg.grid_rows, c.image_size // cfg.grid_cols
            ),
            patch_size=c.patch_size,
            interpret=grid_embed_interpret(),
        )

    def _gather_frames(self, secs: jax.Array) -> jax.Array:
        """(K,) seconds -> (K, ch, cw, 3) uint8 frames.

        Resident cache: a plain gather.  Streaming mode (``step_frames``
        set): map each second to its row in this iteration's host-decoded
        buffer — the engine always passes (subsets of) the step's sampled
        seconds, so every second has exactly one matching row."""
        if self.step_frames is not None:
            idx = jnp.argmax(
                secs[:, None] == self.step_secs[None, :], axis=1
            )
            return self.step_frames[idx]
        return self.cache[secs]

    def _score_grid_full(
        self, secs: jax.Array
    ) -> Tuple[jax.Array, jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
        cfg = self.config
        grid_shape = (cfg.grid_rows, cfg.grid_cols)
        size = self.model.cfg.vision.image_size
        if self.step_frames is not None:
            # streaming: the Pallas/composed preprocess variants all assume a
            # device-resident cache; the plain frames path is the contract
            from tstar_tpu.kernels.image import build_detector_grid_frames

            scores, class_ids, boxes = self._detect(build_detector_grid_frames(
                self._gather_frames(secs), grid_shape, size,
                dtype=self.model.dtype,
            ))
        elif self._use_grid_embed_kernel((1,) + self.cache.shape):
            # Fused Pallas cache->embedding (single video as a B=1 batch);
            # reaches the batch gate only under TSTAR_GRID_EMBED=force.
            scores, class_ids, boxes = self._detect_embeds(
                self._grid_embeds_kernel(self.cache[None], secs[None])
            )
        elif self.grid_proj_w is not None and self.grid_proj_opt_in and (
            not cfg.use_pallas_preprocess
        ):
            scores, class_ids, boxes = self._detect_embeds(
                self._grid_embeds(self.cache, secs)
            )
        elif cfg.use_pallas_preprocess:
            from tstar_tpu.kernels.pallas_grid import build_detector_grid_pallas

            pixels = build_detector_grid_pallas(
                self.cache, secs, grid_shape, size, dtype=self.model.dtype
            )
            scores, class_ids, boxes = self._detect(pixels)
        else:
            pixels = build_detector_grid(
                self.cache, secs, grid_shape, size, dtype=self.model.dtype
            )
            scores, class_ids, boxes = self._detect(pixels)
        keep = scores[0] > cfg.detector_threshold
        conf_map, presence = splat_detections_to_cells(
            boxes[0], scores[0], class_ids[0], keep, self.class_weights,
            grid_shape=grid_shape, image_hw=(size, size),
            num_classes=self.num_classes,
        )
        return conf_map.reshape(-1), presence, (scores[0], class_ids[0], boxes[0])

    def score_grid(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        conf, presence, _ = self._score_grid_full(secs)
        return conf, presence

    def score_grid_detailed(
        self, secs: jax.Array, max_boxes: int = 64
    ) -> Tuple[jax.Array, jax.Array, dict]:
        """score_grid + the top-``max_boxes`` raw detections of the grid image.

        Feeds the per-iteration detection history the reference records for
        its search GIF (``interface_searcher.py:469-474``: annotated grid +
        bbox list each iteration).  Boxes are xyxy in detector-image pixels
        (the S x S grid canvas); ``valid`` marks boxes above the post-process
        threshold.
        """
        conf, presence, (scores, class_ids, boxes) = self._score_grid_full(secs)
        top_s, idx = jax.lax.top_k(scores, min(max_boxes, scores.shape[0]))
        dets = {
            "scores": top_s,
            "class_ids": class_ids[idx],
            "boxes": boxes[idx],
            "valid": top_s > self.config.detector_threshold,
        }
        return conf, presence, dets

    @property
    def _verify_model(self) -> OwlViTDetector:
        return self.verify_model or self.model

    def _detect_verify(self, pixels, query_embeds=None, query_mask=None):
        """_detect through the verification view (reduced-resolution model /
        interpolated pos-emb variables / matching quantized tower when
        configured; the main ones otherwise)."""
        return self._detect(
            pixels,
            model=self._verify_model,
            variables=(
                self.verify_variables
                if self.verify_variables is not None else self.variables
            ),
            qvision=(
                self.qvision_verify
                if self.qvision_verify is not None else self.qvision
            ),
            query_embeds=query_embeds,
            query_mask=query_mask,
        )

    # ---- flat multi-video batch (leading video axis on cache/query fields;
    # see parallel/batched.stack_scorers) ------------------------------------
    #
    # Under jax.vmap the attention einsums become 5D dot_generals that XLA's
    # TPU emitters lower very poorly (device trace r2: the AV matmul ran 7x
    # slower per image than the unbatched form).  These methods instead
    # FLATTEN videos x frames into one detector batch axis — the MXU sees
    # ordinary 4D attention — and vmap only the cheap gather/splat ends.

    def _score_grid_batch_full(self, secs: jax.Array):
        """Shared core of the flat multi-video grid scoring: one grid image
        per video, ONE flat detector forward with per-video query embeddings.
        -> (conf (B, K), presence (B, K, C), raw (scores, class_ids, boxes))."""
        cfg = self.config
        grid_shape = (cfg.grid_rows, cfg.grid_cols)
        size = self.model.cfg.vision.image_size
        if self._use_grid_embed_kernel(self.cache.shape):
            # Fused Pallas cache->embedding (OPT-IN, TSTAR_GRID_EMBED=1,
            # per-shard image batch >= 8): the gather/resize/normalize/
            # pack churn and the (B, S, S, 3) pixel canvas never touch
            # HBM — measured e2e NEUTRAL at the default geometry (the
            # preprocess stream is scheduler-hidden; kernels/grid_embed.py
            # docstring carries the r4 post-mortem).
            embeds = self._grid_embeds_kernel(self.cache, secs)
            scores, class_ids, boxes = self._detect_embeds(embeds)
        elif self.grid_proj_w is not None and self.grid_proj_opt_in and (
            not cfg.use_pallas_preprocess
        ):
            embeds = jax.vmap(
                lambda cache, s: self._grid_embeds(cache, s)[0]
            )(self.cache, secs)                               # (B, P, D)
            scores, class_ids, boxes = self._detect_embeds(embeds)
        else:
            pixels = jax.vmap(
                lambda cache, s: build_detector_grid(
                    cache, s, grid_shape, size, dtype=self.model.dtype
                )[0]
            )(self.cache, secs)                               # (B, S, S, 3)
            scores, class_ids, boxes = self._detect(pixels)  # queries (B,Q,D)
        keep = scores > cfg.detector_threshold

        def one(b, s, c, k, w):
            conf_map, presence = splat_detections_to_cells(
                b, s, c, k, w, grid_shape=grid_shape, image_hw=(size, size),
                num_classes=self.num_classes,
            )
            return conf_map.reshape(-1), presence

        conf, presence = jax.vmap(one)(
            boxes, scores, class_ids, keep, self.class_weights
        )
        return conf, presence, (scores, class_ids, boxes)

    def score_grid_batch(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(B, K) sampled seconds -> (conf (B, K), presence (B, K, C))."""
        conf, presence, _ = self._score_grid_batch_full(secs)
        return conf, presence

    def score_grid_batch_detailed(
        self, secs: jax.Array, max_boxes: int = 64
    ) -> Tuple[jax.Array, jax.Array, dict]:
        """score_grid_batch + each video's top-``max_boxes`` raw detections.

        The multi-video counterpart of ``score_grid_detailed``: feeds the
        per-iteration detection history (reference ``detect_bbox_iters``,
        interface_searcher.py:80-82,469-474) for BATCHED dataset runs.  All
        detection fields carry a leading video axis."""
        conf, presence, (scores, class_ids, boxes) = (
            self._score_grid_batch_full(secs)
        )
        m = min(max_boxes, scores.shape[-1])
        top_s, idx = jax.lax.top_k(scores, m)                 # (B, m)
        dets = {
            "scores": top_s,
            "class_ids": jnp.take_along_axis(class_ids, idx, axis=-1),
            "boxes": jnp.take_along_axis(boxes, idx[..., None], axis=-2),
            "valid": top_s > self.config.detector_threshold,
        }
        return conf, presence, dets

    def score_verify_flat(
        self, video_idx: jax.Array, secs: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Cross-video flat verification: (W,) video indices + (W,) seconds
        -> (conf (W,), presence (W, C)).  Stacked scorer only.  Lets the
        batched search rescore exactly the candidate (video, frame) pairs,
        W per forward, instead of per-video buckets padded across the batch."""
        from tstar_tpu.kernels.image import bilinear_resize, normalize_clip

        size = self._verify_model.cfg.vision.image_size
        frames = self.cache[video_idx, secs]               # (W, h, w, 3)
        pixels = normalize_clip(
            bilinear_resize(frames, (size, size)), self.model.dtype
        )
        scores, class_ids, boxes = self._detect_verify(
            pixels,
            query_embeds=self.query_embeds[video_idx],     # (W, Q, D)
            query_mask=self.query_mask[video_idx],
        )
        keep = scores > self.config.detector_threshold
        cw = self.class_weights[video_idx]

        def one(bx, s, c, k, w):
            conf_map, presence = splat_detections_to_cells(
                bx, s, c, k, w, grid_shape=(1, 1), image_hw=(size, size),
                num_classes=self.num_classes,
            )
            return conf_map[0, 0], presence[0]

        return jax.vmap(one)(boxes, scores, class_ids, keep, cw)

    def score_verify_batch(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(B, T) frame seconds -> (conf (B, T), presence (B, T, C)).

        Gathers per-video frames, then runs ONE flat (B*T)-image verification
        forward (reduced-resolution view when configured)."""
        b, t = secs.shape
        size = self._verify_model.cfg.vision.image_size
        pixels = jax.vmap(
            lambda cache, s: build_verify_batch(
                cache, s, size, dtype=self.model.dtype
            )
        )(self.cache, secs)                                  # (B, T, S, S, 3)
        flat = pixels.reshape(b * t, *pixels.shape[2:])
        qe = jnp.repeat(self.query_embeds, t, axis=0)        # (B*T, Q, D)
        qm = jnp.repeat(self.query_mask, t, axis=0)
        scores, class_ids, boxes = self._detect_verify(
            flat, query_embeds=qe, query_mask=qm
        )
        keep = scores > self.config.detector_threshold
        cw = jnp.repeat(self.class_weights, t, axis=0)       # (B*T, Q)

        def one(bx, s, c, k, w):
            conf_map, presence = splat_detections_to_cells(
                bx, s, c, k, w, grid_shape=(1, 1), image_hw=(size, size),
                num_classes=self.num_classes,
            )
            return conf_map[0, 0], presence[0]

        conf, presence = jax.vmap(one)(boxes, scores, class_ids, keep, cw)
        return conf.reshape(b, t), presence.reshape(b, t, -1)

    def score_verify(self, secs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        from tstar_tpu.kernels.image import bilinear_resize, normalize_clip

        size = self._verify_model.cfg.vision.image_size
        pixels = normalize_clip(
            bilinear_resize(self._gather_frames(secs), (size, size)),
            self.model.dtype,
        )
        return self._score_verify_pixels(pixels)

    def score_verify_raw(self, frames: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Verification rescore from caller-supplied RAW frames (K, h, w, 3)
        uint8 — the reference's fidelity path, which re-decodes the source
        frame at 600x285 instead of reading the HBM cache
        (interface_searcher.py:401-405).  Used by search/reference_verify.py
        and the verification A/B harness."""
        from tstar_tpu.kernels.image import bilinear_resize, normalize_clip

        size = self._verify_model.cfg.vision.image_size
        pixels = normalize_clip(
            bilinear_resize(frames, (size, size)), self.model.dtype
        )
        return self._score_verify_pixels(pixels)

    def _score_verify_pixels(self, pixels: jax.Array) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        size = self._verify_model.cfg.vision.image_size
        scores, class_ids, boxes = self._detect_verify(pixels)
        keep = scores > cfg.detector_threshold

        def one(b, s, c, k):
            conf_map, presence = splat_detections_to_cells(
                b, s, c, k, self.class_weights,
                grid_shape=(1, 1), image_hw=(size, size),
                num_classes=self.num_classes,
            )
            return conf_map[0, 0], presence[0]

        conf, presence = jax.vmap(one)(boxes, scores, class_ids, keep)
        return conf, presence


def build_prompt_batch(
    target_objects: Sequence[str],
    cue_objects: Sequence[str],
    tokenizer,
    config: SearchConfig,
):
    """Tokenize + pad the prompt set to static shapes.

    Layout (interface_searcher.py:87-91 + interface_heuristic.py:268-280):
    targets first (weight 1.0), cues (0.5), the ' ' padding prompt (0.5),
    then masked zero rows up to ``config.max_objects``.  Target slot t of
    the engine's remaining-mask == class slot t.

    Returns (ids (Q, S) int32, attention_mask (Q, S) int32, weights (Q,) f32).
    """
    n_targets = len(target_objects)
    if n_targets > config.max_targets:
        raise ValueError(
            f"{n_targets} targets > max_targets={config.max_targets}; "
            "raise SearchConfig.max_targets"
        )
    texts: List[str] = [t.strip() for t in target_objects] + [
        c.strip() for c in cue_objects
    ] + [" "]
    if len(texts) > config.max_objects:
        raise ValueError(
            f"{len(texts)} prompts > max_objects={config.max_objects}; "
            "raise SearchConfig.max_objects"
        )
    ids, mask = tokenizer.encode_batch(texts)
    q = config.max_objects
    ids_pad = np.zeros((q, ids.shape[1]), np.int32)
    mask_pad = np.zeros((q, ids.shape[1]), np.int32)
    ids_pad[: len(texts)] = ids
    mask_pad[: len(texts)] = mask
    # Padding rows attend to their first (zero) token so the text tower stays
    # finite; their outputs are discarded via the query mask anyway.
    mask_pad[len(texts):, 0] = 1
    weights = np.full((q,), config.cue_weight, np.float32)
    weights[:n_targets] = config.target_weight
    return ids_pad, mask_pad, weights


# Derived weight views (int8 tower, reduced-resolution verify view) are pure
# functions of (model, variables, quant/verify config) and get rebuilt for
# EVERY video by the batched runner's per-video build_scorer calls — on the
# real B/32 model that is an ~87M-param host-side re-quantization per video.
# Memoize on object identity; entries hold a strong reference to their
# variables so ids cannot be reused while cached.  NOTE: that strong
# reference pins up to 8 full weight sets (weakrefs are not an option —
# plain param dicts don't support them); long-lived processes that cycle
# through many distinct weight sets should call
# ``clear_weight_view_cache()`` after dropping a model.
_WEIGHT_VIEW_CACHE: dict = {}


def clear_weight_view_cache() -> None:
    """Release every cached derived weight view (int8 towers, reduced-
    resolution verify views, composed grid projections) and the
    model/variables references they pin."""
    _WEIGHT_VIEW_CACHE.clear()
    _GRID_PROJ_CACHE.clear()
    _GRID_MATS_CACHE.clear()


# Composed cache->patch-embedding projections (kernels/image.py), memoized
# like _WEIGHT_VIEW_CACHE: the host-side weight composition is ~10^8 numpy
# FLOPs + an ~19 MB device upload, and the batched runner rebuilds scorers
# per video with the same weights/geometry.
_GRID_PROJ_CACHE: dict = {}


def _grid_projection(model: OwlViTDetector, variables: Any, cache_hw, config):
    """-> (proj_w, proj_b, src_patch_hw, xla_opt_in) or (None, None, None, False).

    OPT-IN (TSTAR_COMPOSED_PATCH=1) — a MEASURED e2e NEGATIVE as a default
    (r3, scripts/ab_composed.py, interleaved in-process): B=16 sparse
    13,087 vs 14,107 f/s pixel chain (-7%), B=1 sparse inside tenancy
    noise.  The folded matmul removes the resize/normalize/pack pixel
    churn (~1.7 ms/step in the B=16 trace) but its gathered
    (K, P, s_h*s_w*3) patch operand defeats the XLA fusion that feeds the
    patch-embedding MXU matmul straight from the uint8 cache gather —
    same lesson as the Pallas preprocess kernel (kernels/pallas_grid.py).
    Kept because the algebra (kernels/image.composed_patch_projection) is
    parity-pinned and wins may exist at other cache/cell geometries.  The
    DEFAULT fused path is the kernel-space retry that has no gather
    operand to defeat: kernels/grid_embed.py (see _grid_kernel_mats).

    ``proj_w`` is stored as (s_h, s_w*3, D) at the model dtype; the XLA
    path flattens it back (same values — it cast at use anyway).
    """
    import os

    xla_opt_in = os.environ.get("TSTAR_COMPOSED_PATCH", "0") == "1"
    if not xla_opt_in:
        return None, None, None, False
    if config.use_pallas_preprocess:
        return None, None, None, False
    c = model.cfg.vision
    if c.image_size % config.grid_rows or c.image_size % config.grid_cols:
        return None, None, None, False
    cell_hw = (c.image_size // config.grid_rows, c.image_size // config.grid_cols)
    key = (id(variables), id(model), tuple(cache_hw), cell_hw)
    hit = _GRID_PROJ_CACHE.get(key)
    if hit is not None and hit[0] is variables and hit[1] is model:
        return hit[2:] + (xla_opt_in and hit[2] is not None,)

    from tstar_tpu.kernels.image import composed_patch_projection

    kernel = np.asarray(
        variables["params"]["vision"]["patch_embedding"]["kernel"], np.float32
    )
    composed = composed_patch_projection(kernel, tuple(cache_hw), cell_hw, c.patch_size)
    if composed is None:
        out = (None, None, None)
    else:
        w, bias, src_patch = composed
        s_h, s_w = src_patch
        # Stored at the model's compute dtype: numerics-identical to the
        # old f32-storage for both consumers (each cast to model dtype /
        # bf16 at use anyway), at half the HBM for bf16 models.
        out = (
            jnp.asarray(w.reshape(s_h, s_w * 3, -1), dtype=model.dtype),
            jnp.asarray(bias),
            src_patch,
        )
    if len(_GRID_PROJ_CACHE) >= 8:
        _GRID_PROJ_CACHE.pop(next(iter(_GRID_PROJ_CACHE)))
    _GRID_PROJ_CACHE[key] = (variables, model) + out
    return out + (xla_opt_in and out[0] is not None,)


# Device copies of the folded resize/normalize matrices for the fused
# grid-embed kernel, keyed by geometry (model-independent, a few MB —
# re-uploading per video in the batched runner would be pure waste).
_GRID_MATS_CACHE: dict = {}


def _grid_kernel_mats(model: OwlViTDetector, cache_hw, config):
    """-> (gb_awk, gb_bias, gb_ah) device arrays for kernels/grid_embed.py,
    or (None, None, None) when the path cannot apply (OPT-IN and not
    enabled — the r4 A/B measured it e2e neutral, kernels/grid_embed.py —
    off-TPU unless TSTAR_GRID_EMBED=interpret, or non-divisible geometry).
    """
    import os

    env = os.environ.get("TSTAR_GRID_EMBED", "0")
    if env == "0" or config.use_pallas_preprocess:
        return None, None, None
    if env != "interpret":
        try:
            if jax.default_backend() != "tpu":
                return None, None, None
        except Exception:  # noqa: BLE001 — backend not initialized yet
            return None, None, None
    c = model.cfg.vision
    if c.image_size % config.grid_rows or c.image_size % config.grid_cols:
        return None, None, None
    if 128 % c.patch_size or 3 > 128 // c.patch_size:
        return None, None, None
    ch, cw = cache_hw
    cell_h = c.image_size // config.grid_rows
    cell_w = c.image_size // config.grid_cols
    c_pad = 128 // c.patch_size
    key = (ch, cw, cell_h, cell_w, c_pad)
    hit = _GRID_MATS_CACHE.get(key)
    if hit is not None:
        return hit

    from tstar_tpu.kernels.grid_embed import _height_matrix, _width_affine

    awk, bias = _width_affine(cw, cell_w, c_pad)
    ah = _height_matrix(ch, cell_h)
    out = (
        jnp.asarray(awk),
        jnp.asarray(bias),
        None if ah is None else jnp.asarray(ah),
    )
    if len(_GRID_MATS_CACHE) >= 8:
        _GRID_MATS_CACHE.pop(next(iter(_GRID_MATS_CACHE)))
    _GRID_MATS_CACHE[key] = out
    return out


def _weight_views(model: OwlViTDetector, variables: Any, config: SearchConfig):
    """-> (qvision, verify_model, verify_variables, qvision_verify)."""
    if config.detector_quant not in (None, "int8", "w8a16"):
        raise ValueError(
            f"unknown detector_quant={config.detector_quant!r}; "
            "supported: None (bf16), 'int8' (W8A8), 'w8a16' (weight-only)"
        )
    if config.detector_quant is None and config.verify_image_size in (
        None, model.cfg.vision.image_size,
    ):
        return None, None, None, None

    key = (
        id(variables), id(model), config.detector_quant, config.verify_image_size
    )
    hit = _WEIGHT_VIEW_CACHE.get(key)
    if hit is not None and hit[0] is variables and hit[1] is model:
        return hit[2:]

    qvision = None
    if config.detector_quant in ("int8", "w8a16"):
        from tstar_tpu.models.owlvit_quant import quantize_vision_tower

        qvision = quantize_vision_tower(variables, model.cfg)

    verify_model = verify_variables = qvision_verify = None
    if (
        config.verify_image_size is not None
        and config.verify_image_size != model.cfg.vision.image_size
    ):
        from tstar_tpu.models.owlvit import resize_detector

        verify_model, verify_variables = resize_detector(
            model, variables, config.verify_image_size
        )
        if qvision is not None:
            from tstar_tpu.models.owlvit import interpolate_position_embedding

            src = model.cfg.vision
            qvision_verify = {
                **qvision,
                "pos": interpolate_position_embedding(
                    qvision["pos"], src.num_patches_side,
                    config.verify_image_size // src.patch_size,
                ),
            }

    if len(_WEIGHT_VIEW_CACHE) >= 8:
        # evict the least-recently-inserted entry only (dicts preserve
        # insertion order); clearing everything would drop the hot entry too
        _WEIGHT_VIEW_CACHE.pop(next(iter(_WEIGHT_VIEW_CACHE)))
    _WEIGHT_VIEW_CACHE[key] = (
        variables, model, qvision, verify_model, verify_variables, qvision_verify
    )
    return qvision, verify_model, verify_variables, qvision_verify


def make_owlvit_scorer(
    model: OwlViTDetector,
    variables: Any,
    cache: jax.Array,
    target_objects: Sequence[str],
    cue_objects: Sequence[str],
    tokenizer,
    config: SearchConfig,
) -> OwlVitScorer:
    """Build the scorer: tokenize prompts, encode text once, fix weights.

    Prompt layout mirrors the reference (interface_searcher.py:87-91 +
    interface_heuristic.py:268-280): targets first (weight 1.0), then cues
    (0.5), then the ' ' padding prompt (0.5), padded with masked zero rows to
    ``config.max_objects`` so shapes stay static.  Target slot t of the
    engine's remaining-mask corresponds to class slot t here.
    """
    config = resolve_pallas_preprocess(config)
    ids_pad, mask_pad, weights = build_prompt_batch(
        target_objects, cue_objects, tokenizer, config
    )
    query_embeds = model.apply(
        variables, jnp.asarray(ids_pad), jnp.asarray(mask_pad),
        method=OwlViTDetector.encode_text,
    )
    query_mask = jnp.asarray(ids_pad[:, 0] > 0)
    qvision, verify_model, verify_variables, qvision_verify = _weight_views(
        model, variables, config
    )
    grid_proj_w, grid_proj_b, grid_src_patch, grid_proj_opt_in = _grid_projection(
        model, variables, cache.shape[1:3], config
    )
    gb_awk, gb_bias, gb_ah = _grid_kernel_mats(model, cache.shape[1:3], config)
    return OwlVitScorer(
        cache=cache,
        variables=variables,
        query_embeds=query_embeds,
        query_mask=query_mask,
        class_weights=jnp.asarray(weights),
        model=model,
        config=config,
        qvision=qvision,
        verify_variables=verify_variables,
        qvision_verify=qvision_verify,
        verify_model=verify_model,
        grid_proj_w=grid_proj_w,
        grid_proj_b=grid_proj_b,
        grid_src_patch=grid_src_patch,
        grid_proj_opt_in=grid_proj_opt_in,
        gb_awk=gb_awk,
        gb_bias=gb_bias,
        gb_ah=gb_ah,
    )
