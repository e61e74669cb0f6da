"""OWL-ViT open-vocabulary detector in Flax — the default T* heuristic.

Plays the role of the reference's ``OWLInterface`` backend (reference
``TStar/interface_heuristic.py:200-280``: HF ``google/owlvit-base-patch32``
on CUDA), rebuilt as a pure-JAX model so the detector forward lives inside
the jitted search loop.

Architecture matches HF ``OwlViTForObjectDetection`` exactly (verified
numerically against a torch reference in ``tests/test_owlvit.py``):
  * CLIP ViT vision tower (patch conv, CLS + learned positions, pre/post LN,
    quick-GELU pre-norm encoder);
  * CLIP text tower (causal mask, EOT pooling at argmax(ids), projection),
    with the detection-path text embeds L2-normalized;
  * detection heads: patch tokens are post-layernormed, multiplied by the
    broadcast CLS token, layernormed again; a 3-layer GELU box head plus a
    per-patch logit-space grid bias produces cxcywh boxes via sigmoid; the
    class head projects patches to the text dim, L2-normalizes both sides,
    and applies a learned per-patch shift and ELU+1 scale.

TPU-first deviations from the reference *runtime* (not the math):
  * text prompts are encoded ONCE per video (``encode_text``) and reused
    across all search iterations — the reference re-runs its full forward
    (text + vision) on every detector call;
  * vision forward batches over many grid images and runs in bfloat16.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tstar_tpu.models.transformer import (
    Encoder,
    LayerNorm,
    causal_bias,
    padding_bias,
)


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 32
    image_size: int = 768
    activation: str = "quick_gelu"
    eps: float = 1e-5

    @property
    def num_patches_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_side ** 2


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    max_length: int = 16
    activation: str = "quick_gelu"
    eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class OwlViTConfig:
    vision: VisionConfig = dataclasses.field(default_factory=VisionConfig)
    text: TextConfig = dataclasses.field(default_factory=TextConfig)
    projection_dim: int = 512


def owlvit_base_patch32() -> OwlViTConfig:
    """The reference's default checkpoint config (interface_heuristic.py:176)."""
    return OwlViTConfig()


def patchify(pixels: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, P, p*p*C) non-overlapping patches, (ph, pw, c)
    minor order (matches an HWIO conv kernel flattened to (p*p*C, D))."""
    b, h, w, ch = pixels.shape
    p = patch_size
    x = pixels.reshape(b, h // p, p, w // p, p, ch)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * ch)


class PatchEmbed(nn.Module):
    """Stride=kernel patch conv expressed as patchify + ONE MXU matmul.

    XLA's conv emitter runs this shape (32x32/32 stride over 768^2) at ~10%
    MFU on v5e (measured from a device trace, r2); the identical math as a
    (B*P, 3072) x (3072, D) matmul hits normal matmul efficiency.  The param
    keeps nn.Conv's HWIO kernel layout/name so HF checkpoint conversion is
    unchanged (convert_hf_owlvit_state_dict).
    """

    features: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        p = self.patch_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, pixels.shape[-1], self.features),
        )
        x = pixels.astype(self.dtype)
        from tstar_tpu.kernels.patch_matmul import (
            patch_embed_matmul,
            use_patch_embed_kernel,
        )

        if use_patch_embed_kernel(x, p, self.features):
            # Fused patchify->matmul (kernels/patch_matmul.py): removes the
            # batch-growing HBM layout-copy chain XLA emits for the
            # transpose below (~2 ms/step at B=16 in the r3 trace).
            return patch_embed_matmul(x, kernel.astype(self.dtype))
        x = patchify(x, p)
        w = kernel.astype(self.dtype).reshape(-1, self.features)
        return jnp.einsum("bpk,kd->bpd", x, w)


class VisionTower(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.patch_embedding = PatchEmbed(
            c.hidden_size, c.patch_size, dtype=self.dtype
        )
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        )
        self.position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (1 + c.num_patches, c.hidden_size),
        )
        self.pre_layernorm = LayerNorm(epsilon=c.eps, dtype=self.dtype)
        self.encoder = Encoder(
            c.num_layers, c.num_heads, c.intermediate_size, c.activation,
            c.eps, dtype=self.dtype,
        )

    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels (B, H, W, 3) normalized -> last hidden states (B, 1+P, D)."""
        return self.from_patches(self.patch_embedding(pixels))

    def from_patches(self, patches: jax.Array) -> jax.Array:
        """(B, P, D) patch embeddings -> last hidden states (B, 1+P, D).

        Split out so the composed cache->embedding projection
        (``kernels/image.grid_patch_embeddings``) can feed the tower without
        materializing detector pixels."""
        c = self.cfg
        b = patches.shape[0]
        cls = self.class_embedding.astype(self.dtype)
        cls = jnp.broadcast_to(cls, (b, 1, c.hidden_size))
        x = jnp.concatenate([cls, patches.astype(self.dtype)], axis=1)
        x = x + self.position_embedding.astype(self.dtype)[None]
        x = self.pre_layernorm(x)
        return self.encoder(x)


class TextTower(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: Optional[jax.Array]) -> jax.Array:
        """input_ids (Q, S) -> pooled EOT features (Q, D) (pre-projection)."""
        c = self.cfg
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02), (c.vocab_size, c.hidden_size)
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (c.max_length, c.hidden_size)
        )
        seq = input_ids.shape[-1]
        x = tok.astype(self.dtype)[input_ids] + pos.astype(self.dtype)[None, :seq]

        bias = causal_bias(seq, jnp.float32)
        if attention_mask is not None:
            bias = bias + padding_bias(attention_mask, jnp.float32)
        x = Encoder(
            c.num_layers, c.num_heads, c.intermediate_size, c.activation, c.eps,
            dtype=self.dtype, name="encoder",
        )(x, bias)
        x = LayerNorm(epsilon=c.eps, dtype=self.dtype, name="final_layer_norm")(x)

        # CLIP EOT pooling: the end-of-text token has the highest id.
        eot = jnp.argmax(input_ids, axis=-1)
        return x[jnp.arange(x.shape[0]), eot]


class BoxHead(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        d = feats.shape[-1]
        x = nn.Dense(d, dtype=self.dtype, name="dense0")(feats)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(d, dtype=self.dtype, name="dense1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(4, dtype=self.dtype, name="dense2")(x)


class ClassHead(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, image_feats: jax.Array, query_embeds: jax.Array, query_mask: Optional[jax.Array]
    ) -> jax.Array:
        """query_embeds (Q, D) shared across the image batch, or (B, Q, D)
        per-image query sets (the flat multi-video detector batch); the
        query_mask rank follows (``(Q,)`` or ``(B, Q)``)."""
        img = nn.Dense(self.out_dim, dtype=self.dtype, name="dense0")(image_feats)
        img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-6)
        q = query_embeds / (jnp.linalg.norm(query_embeds, axis=-1, keepdims=True) + 1e-6)
        if query_embeds.ndim == 3:
            logits = jnp.einsum("bpd,bqd->bpq", img, q.astype(img.dtype))
        else:
            logits = jnp.einsum("bpd,qd->bpq", img, q.astype(img.dtype))

        shift = nn.Dense(1, dtype=self.dtype, name="logit_shift")(image_feats)
        scale = nn.Dense(1, dtype=self.dtype, name="logit_scale")(image_feats)
        scale = nn.elu(scale) + 1.0
        logits = (logits + shift) * scale
        if query_mask is not None:
            mask = (
                query_mask[:, None, :] if query_mask.ndim == 2
                else query_mask[None, None, :]
            )
            neg = jnp.finfo(jnp.float32).min
            logits = jnp.where(mask, logits, neg)
        return logits.astype(jnp.float32)


def box_bias(num_patches_side: int) -> jax.Array:
    """Per-patch logit-space prior over box center/size (HF compute_box_bias)."""
    n = num_patches_side
    coords = (jnp.arange(1, n + 1, dtype=jnp.float32)) / n
    xx, yy = jnp.meshgrid(coords, coords, indexing="xy")
    centers = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)
    centers = jnp.clip(centers, 0.0, 1.0)
    coord_bias = jnp.log(centers + 1e-4) - jnp.log1p(-centers + 1e-4)
    size = jnp.full_like(centers, 1.0 / n)
    size_bias = jnp.log(size + 1e-4) - jnp.log1p(-size + 1e-4)
    return jnp.concatenate([coord_bias, size_bias], axis=-1)


class OwlViTDetector(nn.Module):
    """Full detector.  Methods are exposed separately so text encoding can be
    hoisted out of the search loop (see module docstring)."""

    cfg: OwlViTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.vision = VisionTower(c.vision, dtype=self.dtype)
        self.text = TextTower(c.text, dtype=self.dtype)
        self.text_projection = nn.Dense(
            c.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection"
        )
        self.post_layernorm = LayerNorm(
            epsilon=c.vision.eps, dtype=self.dtype, name="post_layernorm"
        )
        self.merged_layernorm = LayerNorm(
            epsilon=c.vision.eps, dtype=self.dtype, name="merged_layernorm"
        )
        self.box_head = BoxHead(dtype=self.dtype)
        self.class_head = ClassHead(c.text.hidden_size, dtype=self.dtype)

    def encode_text(
        self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """(Q, S) token ids -> L2-normalized query embeddings (Q, proj_dim).

        Matches the detection path in HF OwlViTModel.forward: projection then
        L2 normalization (the class head re-normalizes, which is idempotent).
        """
        pooled = self.text(input_ids, attention_mask)
        proj = self.text_projection(pooled)
        return proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)

    def encode_image(self, pixels: jax.Array) -> jax.Array:
        """(B, H, W, 3) -> merged per-patch features (B, P, D)."""
        return self._merge(self.vision(pixels))

    def encode_patches(self, patch_embeds: jax.Array) -> jax.Array:
        """(B, P, D) precomputed patch embeddings -> merged features (B, P, D).

        Same as ``encode_image`` minus the patch-embedding matmul: the
        detector-scorer's composed cache->embedding path
        (``kernels/image.grid_patch_embeddings``) enters here."""
        return self._merge(self.vision.from_patches(patch_embeds))

    def _merge(self, hidden: jax.Array) -> jax.Array:
        hidden = self.post_layernorm(hidden)
        cls_token = hidden[:, :1, :]
        feats = hidden[:, 1:, :] * cls_token
        return self.merged_layernorm(feats)

    def predict(
        self,
        image_feats: jax.Array,                 # (B, P, D)
        query_embeds: jax.Array,                # (Q, proj_dim)
        query_mask: Optional[jax.Array] = None,  # (Q,) bool
    ) -> Tuple[jax.Array, jax.Array]:
        """-> (logits (B, P, Q) f32, boxes cxcywh in [0,1] (B, P, 4) f32)."""
        logits = self.class_head(image_feats, query_embeds, query_mask)
        raw = self.box_head(image_feats)
        boxes = jax.nn.sigmoid(
            raw.astype(jnp.float32) + box_bias(self.cfg.vision.num_patches_side)
        )
        return logits, boxes

    def __call__(
        self,
        pixels: jax.Array,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        query_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        queries = self.encode_text(input_ids, attention_mask)
        feats = self.encode_image(pixels)
        return self.predict(feats, queries, query_mask)


def interpolate_position_embedding(
    pos: jax.Array, src_side: int, dst_side: int
) -> jax.Array:
    """Bicubically resample a ViT position embedding to a new patch grid.

    ``pos`` is (1 + src_side^2, D) with the CLS row first.  Standard ViT
    resolution-change recipe (HF Owlv2 ``interpolate_pos_encoding`` uses
    bicubic; ``method="cubic"`` is jax.image's Keys cubic — the same filter
    family, matching the cited recipe); used to run verification rescores at
    a reduced image size (SearchConfig.verify_image_size).
    """
    cls_row, grid = pos[:1], pos[1:]
    d = grid.shape[-1]
    grid = grid.reshape(src_side, src_side, d)
    grid = jax.image.resize(grid, (dst_side, dst_side, d), method="cubic")
    return jnp.concatenate([cls_row, grid.reshape(dst_side * dst_side, d)], axis=0)


def resize_detector(
    model: "OwlViTDetector", variables, image_size: int
) -> Tuple["OwlViTDetector", Any]:
    """A detector view at a different input resolution, sharing all weights.

    Only the vision position embedding is resampled (new array); every other
    parameter leaf is the SAME buffer — no weight duplication in HBM.
    """
    src = model.cfg.vision
    if image_size == src.image_size:
        return model, variables
    if image_size % src.patch_size:
        raise ValueError(
            f"image_size {image_size} not a multiple of patch {src.patch_size}"
        )
    new_cfg = dataclasses.replace(
        model.cfg, vision=dataclasses.replace(src, image_size=image_size)
    )
    new_model = OwlViTDetector(new_cfg, dtype=model.dtype)
    pos = variables["params"]["vision"]["position_embedding"]
    new_pos = interpolate_position_embedding(
        jnp.asarray(pos), src.num_patches_side, image_size // src.patch_size
    )
    params = dict(variables["params"])
    vision = dict(params["vision"])
    vision["position_embedding"] = new_pos
    params["vision"] = vision
    return new_model, {**variables, "params": params}


# ---------------------------------------------------------------------------
# Post-processing (mirrors OwlViTImageProcessor.post_process_object_detection
# / ..._grounded_object_detection: per-query max over classes, sigmoid score,
# cxcywh -> xyxy scaled by (w, h, w, h)).
# ---------------------------------------------------------------------------

def postprocess_detections(
    logits: jax.Array,   # (B, P, Q)
    boxes: jax.Array,    # (B, P, 4) cxcywh normalized
    image_hw: Tuple[int, int],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (scores (B, P), class_ids (B, P), boxes_xyxy_pixels (B, P, 4))."""
    best = jnp.max(logits, axis=-1)
    scores = jax.nn.sigmoid(best)
    class_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    xyxy = jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )
    ih, iw = image_hw
    scale = jnp.asarray([iw, ih, iw, ih], xyxy.dtype)
    return scores, class_ids, xyxy * scale


# ---------------------------------------------------------------------------
# Weight conversion from HF torch checkpoints.
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def convert_hf_owlvit_state_dict(sd: Dict[str, Any], cfg: OwlViTConfig) -> Dict:
    """Convert an HF OwlViT/Owlv2 ``ForObjectDetection`` state dict to params.

    Accepts torch tensors or numpy arrays.  Layout notes: torch Linear weights
    are (out, in) -> flax kernels (in, out); the patch conv is (D, 3, k, k) ->
    (k, k, 3, D).  OWLv2 checkpoints (prefix ``owlv2.``) share the
    architecture; their extra objectness head is not used by the T* scoring
    path (the reference post-process consumes class logits only,
    interface_heuristic.py:242-243) and is skipped.
    """
    base = "owlv2" if any(k.startswith("owlv2.") for k in sd) else "owlvit"

    def linear(prefix):
        return {
            "kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"]),
        }

    def layernorm(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}

    def encoder(prefix, num_layers):
        out = {}
        for i in range(num_layers):
            lp = f"{prefix}.layers.{i}"
            out[f"layers_{i}"] = {
                "layer_norm1": layernorm(f"{lp}.layer_norm1"),
                "layer_norm2": layernorm(f"{lp}.layer_norm2"),
                "self_attn": {
                    "q_proj": linear(f"{lp}.self_attn.q_proj"),
                    "k_proj": linear(f"{lp}.self_attn.k_proj"),
                    "v_proj": linear(f"{lp}.self_attn.v_proj"),
                    "out_proj": linear(f"{lp}.self_attn.out_proj"),
                },
                "mlp": {
                    "fc1": linear(f"{lp}.mlp.fc1"),
                    "fc2": linear(f"{lp}.mlp.fc2"),
                },
            }
        return out

    v = f"{base}.vision_model"
    t = f"{base}.text_model"
    params = {
        "vision": {
            "patch_embedding": {
                "kernel": _t(sd[f"{v}.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
            },
            "class_embedding": _t(sd[f"{v}.embeddings.class_embedding"]),
            "position_embedding": _t(sd[f"{v}.embeddings.position_embedding.weight"]),
            "pre_layernorm": layernorm(f"{v}.pre_layernorm"),
            "encoder": encoder(f"{v}.encoder", cfg.vision.num_layers),
        },
        "text": {
            "token_embedding": _t(sd[f"{t}.embeddings.token_embedding.weight"]),
            "position_embedding": _t(sd[f"{t}.embeddings.position_embedding.weight"]),
            "encoder": encoder(f"{t}.encoder", cfg.text.num_layers),
            "final_layer_norm": layernorm(f"{t}.final_layer_norm"),
        },
        "text_projection": {"kernel": _t(sd[f"{base}.text_projection.weight"]).T},
        "post_layernorm": layernorm(f"{v}.post_layernorm"),
        "merged_layernorm": layernorm("layer_norm"),
        "box_head": {
            "dense0": linear("box_head.dense0"),
            "dense1": linear("box_head.dense1"),
            "dense2": linear("box_head.dense2"),
        },
        "class_head": {
            "dense0": linear("class_head.dense0"),
            "logit_shift": linear("class_head.logit_shift"),
            "logit_scale": linear("class_head.logit_scale"),
        },
    }
    return {"params": params}
