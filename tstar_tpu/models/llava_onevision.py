"""LLaVA-OneVision in Flax: SigLIP tower + projector + Qwen2 LM.

The reference ships only a fake LLaVA backend returning a canned string
(``TStar/interface_grounding.py:12-44``); this is a real implementation of
the LLaVA-OneVision architecture (BASELINE config 3) for multi-frame video
QA — the path T* actually exercises:

  * SigLIP vision tower per frame (models/siglip.py);
  * 2-layer GELU multimodal projector;
  * bilinear 2x token pooling per frame and frame concatenation (HF
    ``get_video_features``/``apply_pooling``), followed by one
    ``image_newline`` vector per video;
  * Qwen2 decoder reused from models/qwen2vl.py with standard 1-D RoPE
    (expressed as M-RoPE with a single full-width section).

Single-image anyres tiling (grid pinpoints + unpadding) is future work; T*'s
grounding/QA feeds <= 8 uniformly sized frames through the video path.
Parity vs tiny random HF ``LlavaOnevisionForConditionalGeneration`` is
tested in ``tests/test_llava_onevision.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tstar_tpu.models.qwen2vl import (
    Qwen2DecoderLayer,
    Qwen2VLTextConfig,
    RMSNorm,
    mrope_cos_sin,
)
from tstar_tpu.models.siglip import SiglipVisionConfig, SiglipVisionTower, convert_hf_siglip


@dataclasses.dataclass(frozen=True)
class LlavaOnevisionConfig:
    vision: SiglipVisionConfig = dataclasses.field(default_factory=SiglipVisionConfig)
    text: Qwen2VLTextConfig = dataclasses.field(
        default_factory=lambda: Qwen2VLTextConfig(mrope_section=(64, 0, 0))
    )
    image_token_id: int = 151646
    video_token_id: int = 151647
    vision_feature_layer: int = -1
    vision_feature_select_strategy: str = "full"
    projector_bias: bool = True

    @property
    def tokens_per_frame(self) -> int:
        side = self.vision.image_size // self.vision.patch_size
        pooled = -(-side // 2)
        return pooled * pooled


class LlavaOnevisionModel(nn.Module):
    """Method surface mirrors Qwen2VLModel so models/generate.py works as-is
    (``encode_images`` here consumes raw frame pixels; grid_hw is unused)."""

    cfg: LlavaOnevisionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        t = self.cfg.text
        self.vision = SiglipVisionTower(self.cfg.vision, dtype=self.dtype, name="vision_tower")
        self.proj_1 = nn.Dense(
            t.hidden_size, use_bias=self.cfg.projector_bias, dtype=self.dtype,
            name="projector_linear_1",
        )
        self.proj_2 = nn.Dense(
            t.hidden_size, use_bias=self.cfg.projector_bias, dtype=self.dtype,
            name="projector_linear_2",
        )
        self.image_newline = self.param(
            "image_newline", nn.initializers.normal(0.02), (t.hidden_size,)
        )
        self.embed_tokens = nn.Embed(
            t.vocab_size, t.hidden_size, dtype=self.dtype, name="embed_tokens"
        )
        self.layers = [
            Qwen2DecoderLayer(t, dtype=self.dtype, name=f"layers_{i}")
            for i in range(t.num_layers)
        ]
        self.final_norm = RMSNorm(t.rms_norm_eps, dtype=self.dtype, name="norm")
        if not t.tie_word_embeddings:
            self.lm_head = nn.Dense(
                t.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head"
            )

    # -- vision -----------------------------------------------------------
    def _pool_tokens(self, feats: jax.Array) -> jax.Array:
        """Per-frame bilinear 2x token pooling (HF apply_pooling)."""
        side = self.cfg.vision.image_size // self.cfg.vision.patch_size
        f, _, d = feats.shape
        grid = feats.reshape(f, side, side, d).astype(jnp.float32)
        out = -(-side // 2)
        # torch F.interpolate(bilinear) does not antialias on downscale
        pooled = jax.image.resize(
            grid, (f, out, out, d), method="bilinear", antialias=False
        )
        return pooled.reshape(f, out * out, d).astype(feats.dtype)

    def encode_images(
        self, frames: jax.Array, grid_hw: Optional[Tuple[int, int]] = None
    ) -> jax.Array:
        """(F, S, S, 3) normalized frames -> (1, F*pooled + 1, hidden): the
        video-token stream including the trailing image_newline."""
        del grid_hw
        feats = self.vision(frames, self.cfg.vision_feature_layer)
        if self.cfg.vision_feature_select_strategy == "default":
            feats = feats[:, 1:]
        feats = self.proj_2(nn.gelu(self.proj_1(feats), approximate=False))
        pooled = self._pool_tokens(feats)                  # (F, P', D)
        flat = pooled.reshape(-1, pooled.shape[-1])
        newline = self.image_newline.astype(flat.dtype)[None]
        return jnp.concatenate([flat, newline], axis=0)[None]

    def encode_anyres_image(
        self,
        tiles: jax.Array,                 # (1 + n_tiles, S, S, 3): base FIRST
        image_size: Tuple[int, int],      # original (H, W), static
        grid_shape: Tuple[int, int],      # (num_patch_h, num_patch_w), static
        max_num_patches: int = 9,         # "anyres_max_9"
    ) -> jax.Array:
        """AnyRes single-image path -> (num_tokens, hidden) feature stream.

        Mirrors HF ``pack_image_features``: base features first, then the
        tile grid reassembled spatially, unpadded to the original aspect,
        downscaled if above the max-patches token budget, with an
        ``image_newline`` appended to every row.
        """
        feats = self.vision(tiles, self.cfg.vision_feature_layer)
        if self.cfg.vision_feature_select_strategy == "default":
            feats = feats[:, 1:]
        feats = self.proj_2(nn.gelu(self.proj_1(feats), approximate=False))
        base = feats[0]                                   # (P, D)
        side = self.cfg.vision.image_size // self.cfg.vision.patch_size
        nph, npw = grid_shape
        d = feats.shape[-1]
        grid = feats[1:].reshape(nph, npw, side, side, d)
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(nph * side, npw * side, d)

        # unpad to the original aspect ratio (HF unpad_image)
        oh, ow = image_size
        ch, cw = grid.shape[:2]
        if ow / oh > cw / ch:
            scale = cw / ow
            new_h = int(oh * scale)
            pad = (ch - new_h) // 2
            grid = grid[pad : ch - pad]
        else:
            scale = ch / oh
            new_w = int(ow * scale)
            pad = (cw - new_w) // 2
            grid = grid[:, pad : cw - pad]

        # token budget: downscale if above max_num_patches base-tiles worth
        import math as _math

        ch, cw = grid.shape[:2]
        ratio = _math.sqrt(ch * cw / (max_num_patches * side ** 2))
        if ratio > 1.1:
            grid = jax.image.resize(
                grid.astype(jnp.float32)[None],
                (1, int(ch // ratio), int(cw // ratio), d),
                method="bilinear", antialias=False,
            )[0].astype(feats.dtype)

        newline = jnp.broadcast_to(
            self.image_newline.astype(grid.dtype), (grid.shape[0], 1, d)
        )
        grid = jnp.concatenate([grid, newline], axis=1)   # newline per row
        return jnp.concatenate([base, grid.reshape(-1, d)], axis=0)

    # -- LM (same contract as Qwen2VLModel) --------------------------------
    def embed(self, input_ids: jax.Array, image_embeds: Optional[jax.Array]) -> jax.Array:
        x = self.embed_tokens(input_ids)
        if image_embeds is None:
            return x
        mask = input_ids == self.cfg.video_token_id
        flat_mask = mask.reshape(-1)
        order = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
        gathered = image_embeds[jnp.clip(order, 0, image_embeds.shape[0] - 1)]
        flat_x = x.reshape(-1, x.shape[-1])
        flat_x = jnp.where(flat_mask[:, None], gathered.astype(x.dtype), flat_x)
        return flat_x.reshape(x.shape)

    def decoder(self, hidden, position_ids, attn_bias, caches=None, cache_index=None):
        t = self.cfg.text
        cos, sin = mrope_cos_sin(position_ids, t.head_dim, t.mrope_section, t.rope_theta)
        new_caches = []
        for i, layer in enumerate(self.layers):
            cache_i = caches[i] if caches is not None else None
            hidden, new_cache = layer(hidden, cos, sin, attn_bias, cache_i, cache_index)
            new_caches.append(new_cache)
        hidden = self.final_norm(hidden)
        return hidden, (new_caches if caches is not None else None)

    def logits(self, hidden: jax.Array) -> jax.Array:
        if self.cfg.text.tie_word_embeddings:
            return self.embed_tokens.attend(hidden).astype(jnp.float32)
        return self.lm_head(hidden).astype(jnp.float32)

    def __call__(
        self,
        input_ids: jax.Array,
        position_ids: jax.Array,               # (3, B, S); rows equal (1-D rope)
        attention_mask: Optional[jax.Array] = None,
        video_frames: Optional[jax.Array] = None,   # (F, S, S, 3)
        grid_hw: Optional[Tuple[int, int]] = None,
    ) -> jax.Array:
        del grid_hw
        b, s = input_ids.shape
        embeds = None
        if video_frames is not None:
            enc = self.encode_images(video_frames)
            embeds = enc.reshape(-1, enc.shape[-1])
        hidden = self.embed(input_ids, embeds)
        neg = jnp.finfo(jnp.float32).min
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        bias = jnp.where(causal, 0.0, neg)
        if attention_mask is not None:
            bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
        hidden, _ = self.decoder(hidden, position_ids, bias)
        return self.logits(hidden)


# ---------------------------------------------------------------------------
# Input preparation (processor + chat template)
# ---------------------------------------------------------------------------

SIGLIP_MEAN = 0.5
SIGLIP_STD = 0.5


def preprocess_frames_llava(frames, cfg: LlavaOnevisionConfig) -> np.ndarray:
    """Frames (list of HxWx3 uint8) -> (F, S, S, 3) SigLIP-normalized f32."""
    import cv2

    s = cfg.vision.image_size
    out = []
    for f in frames:
        r = cv2.resize(np.asarray(f), (s, s), interpolation=cv2.INTER_CUBIC)
        out.append((r.astype(np.float32) / 255.0 - SIGLIP_MEAN) / SIGLIP_STD)
    return np.stack(out)


def select_best_resolution(original_hw, possible_resolutions):
    """Max effective resolution, min waste (HF select_best_resolution)."""
    oh, ow = original_hw
    best, best_eff, best_waste = None, 0, float("inf")
    for h, w in possible_resolutions:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (h, w), eff, waste
    return best


def preprocess_anyres_image(
    image: np.ndarray,                # (H, W, 3) uint8 RGB
    cfg: LlavaOnevisionConfig,
    grid_pinpoints,                   # [[h, w], ...]
):
    """Image -> AnyRes tiles for ``encode_anyres_image``.

    Mirrors HF ``LlavaOnevisionImageProcessor.get_image_patches``: pick the
    best pinpoint canvas, aspect-preserving resize + centered zero-pad, tile
    into vision-size squares, and prepend the squashed full image as the base
    tile.  Returns (tiles (1+n, S, S, 3) normalized f32, image_size (H, W),
    grid_shape (nph, npw)).
    """
    import cv2

    s = cfg.vision.image_size
    oh, ow = image.shape[:2]
    th, tw = select_best_resolution((oh, ow), grid_pinpoints)
    # HF get_patch_output_size: the tighter axis hits the target exactly
    if tw / ow < th / oh:
        nw, nh = tw, min(int(np.ceil(oh * (tw / ow))), th)
    else:
        nh, nw = th, min(int(np.ceil(ow * (th / oh))), tw)
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_CUBIC)
    canvas = np.zeros((th, tw, 3), image.dtype)
    top, left = (th - nh) // 2, (tw - nw) // 2
    canvas[top : top + nh, left : left + nw] = resized

    def norm(img):
        return (img.astype(np.float32) / 255.0 - SIGLIP_MEAN) / SIGLIP_STD

    nph, npw = th // s, tw // s
    tiles = [norm(cv2.resize(image, (s, s), interpolation=cv2.INTER_CUBIC))]  # base
    for r in range(nph):
        for c in range(npw):
            tiles.append(norm(canvas[r * s : (r + 1) * s, c * s : (c + 1) * s]))
    return np.stack(tiles), (oh, ow), (nph, npw)


def prepare_llava_inputs(tokenizer, query: str, frames, cfg: LlavaOnevisionConfig):
    """-> generate() kwargs; frames enter as ONE video block (the LLaVA-OV
    video path), regardless of where <image> tags sit in the query."""
    from tstar_tpu.models.qwen2vl import build_mrope_position_ids

    n_frames = len(frames)
    text = query.replace("<image>", "").strip()
    if n_frames:
        n_tokens = n_frames * cfg.tokens_per_frame + 1   # + image_newline
        video_block = "<video>" + "\n"
    else:
        n_tokens = 0
        video_block = ""
    chat = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        f"<|im_start|>user\n{video_block}{text}<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    parts = chat.split("<video>")
    ids: list = list(tokenizer.encode(parts[0]))
    if len(parts) > 1:
        ids.extend([cfg.video_token_id] * n_tokens)
        ids.extend(tokenizer.encode(parts[1]))
    ids_np = np.asarray(ids, np.int32)[None]
    pos = build_mrope_position_ids(ids_np[0], -1, [], 2)[:, None]  # plain rope
    pixels = preprocess_frames_llava(frames, cfg) if n_frames else None
    return {
        "input_ids": ids_np,
        "prompt_lens": np.asarray([ids_np.shape[1]], np.int32),
        "position_ids": pos,
        "image_patches": pixels,
        "image_grid_hw": None,
    }


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def convert_hf_llava_onevision_state_dict(
    sd: Dict[str, Any], cfg: LlavaOnevisionConfig
) -> Dict:
    def pick(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(names[0])

    def linear(*names, bias=True):
        out = {"kernel": _t(pick(*names)).T}
        if bias:
            out["bias"] = _t(pick(*[n.replace(".weight", ".bias") for n in names]))
        return out

    def rms(*names):
        return {"scale": _t(pick(*names))}

    vt = "model.vision_tower.vision_model."
    params: Dict[str, Any] = {
        "vision_tower": convert_hf_siglip(sd, cfg.vision, vt),
        "projector_linear_1": linear(
            "model.multi_modal_projector.linear_1.weight", bias=cfg.projector_bias
        ),
        "projector_linear_2": linear(
            "model.multi_modal_projector.linear_2.weight", bias=cfg.projector_bias
        ),
        "image_newline": _t(pick("model.image_newline")),
        "embed_tokens": {
            "embedding": _t(pick("model.language_model.embed_tokens.weight"))
        },
        "norm": rms("model.language_model.norm.weight"),
    }
    t = cfg.text
    for i in range(t.num_layers):
        lp = f"model.language_model.layers.{i}"
        params[f"layers_{i}"] = {
            "input_layernorm": rms(f"{lp}.input_layernorm.weight"),
            "post_attention_layernorm": rms(f"{lp}.post_attention_layernorm.weight"),
            "q_proj": linear(f"{lp}.self_attn.q_proj.weight"),
            "k_proj": linear(f"{lp}.self_attn.k_proj.weight"),
            "v_proj": linear(f"{lp}.self_attn.v_proj.weight"),
            "o_proj": linear(f"{lp}.self_attn.o_proj.weight", bias=False),
            "gate_proj": linear(f"{lp}.mlp.gate_proj.weight", bias=False),
            "up_proj": linear(f"{lp}.mlp.up_proj.weight", bias=False),
            "down_proj": linear(f"{lp}.mlp.down_proj.weight", bias=False),
        }
    if not t.tie_word_embeddings:
        params["lm_head"] = {"kernel": _t(pick("lm_head.weight")).T}
    return {"params": params}
