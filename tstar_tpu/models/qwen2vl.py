"""Qwen2-VL in Flax: the JAX VLM for grounding and QA.

Counterpart of the reference's torch/CUDA VLM backend
(``TStar/interface_grounding.py:49-133``: ``Qwen2_5_VLForConditionalGeneration``
with ``device_map="auto"``), rebuilt as a pure-JAX model so grounding/QA run
on TPU with pjit-shardable weights.  Architecture matches HF
``Qwen2VLForConditionalGeneration`` (numerical parity against a tiny random
torch model in ``tests/test_qwen2vl.py``):

  * vision tower — 14px patch embed expressed as a single flattened-patch
    matmul (MXU-native; equals HF's stride=kernel Conv3d), 2D rotary
    position embedding over the patch grid in spatial-merge raster order,
    pre-LN blocks with fused-QKV attention, and a 2x2 PatchMerger MLP into
    the LM width;
  * language model — Qwen2 decoder: RMSNorm, GQA with bias on q/k/v,
    SwiGLU MLP, and multimodal 3D RoPE (M-RoPE: temporal/height/width
    channel sections; text tokens use equal t/h/w positions);
  * image tokens are scattered into the text embedding sequence at
    ``image_token_id`` positions.

TPU-first deviations from the reference runtime: bfloat16 compute with fp32
RoPE/softmax, static-shape KV-cache generation (models/generate.py), and
tensor-parallel shardings over the ``model`` mesh axis (parallel/shardings.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tstar_tpu.models.transformer import ACTIVATIONS


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    mlp_ratio: float = 4.0
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    hidden_size: int = 3584          # LM width the merger projects into
    hidden_act: str = "quick_gelu"
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


@dataclasses.dataclass(frozen=True)
class Qwen2VLTextConfig:
    vocab_size: int = 152064
    hidden_size: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    intermediate_size: int = 18944
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    mrope_section: Tuple[int, int, int] = (16, 24, 24)
    tie_word_embeddings: bool = False
    hidden_act: str = "silu"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    vision: Qwen2VLVisionConfig = dataclasses.field(default_factory=Qwen2VLVisionConfig)
    text: Qwen2VLTextConfig = dataclasses.field(default_factory=Qwen2VLTextConfig)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------

class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (norm * scale).astype(self.dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array):
    """q/k: (..., S, H, D); cos/sin broadcastable to (..., S, 1, D).  fp32."""
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + rotate_half(qf) * sin
    k_out = kf * cos + rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def vision_rope_angles(
    grid_h: int, grid_w: int, head_dim: int, merge: int = 2, theta: float = 10000.0
) -> np.ndarray:
    """Rotary angles per patch in spatial-merge raster order -> (P, head_dim/2).

    Mirrors HF ``rot_pos_emb`` (modeling_qwen2_vl.py): h/w position ids are
    laid out as (h/merge, w/merge, merge, merge) blocks, and the h-angles and
    w-angles (each head_dim/4 frequencies) concatenate along the channel dim.
    """
    dim_quarter = head_dim // 4
    inv_freq = 1.0 / (theta ** (np.arange(0, dim_quarter * 2, 2, np.float32) / (dim_quarter * 2)))

    def block_order(ids_2d: np.ndarray) -> np.ndarray:
        h, w = ids_2d.shape
        return (
            ids_2d.reshape(h // merge, merge, w // merge, merge)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )

    hpos = block_order(np.broadcast_to(np.arange(grid_h)[:, None], (grid_h, grid_w)))
    wpos = block_order(np.broadcast_to(np.arange(grid_w)[None, :], (grid_h, grid_w)))
    freqs_h = hpos[:, None].astype(np.float32) * inv_freq[None]
    freqs_w = wpos[:, None].astype(np.float32) * inv_freq[None]
    return np.concatenate([freqs_h, freqs_w], axis=-1)  # (P, head_dim/2)


class VisionBlock(nn.Module):
    cfg: Qwen2VLVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.eps, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * c.embed_dim, dtype=self.dtype, name="qkv")(h)
        s = x.shape[-2]
        qkv = qkv.reshape(*x.shape[:-1], 3, c.num_heads, c.head_dim)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        q, k = apply_rope(q, k, cos, sin)
        scale = c.head_dim ** -0.5
        logits = jnp.einsum("...qhd,...khd->...hqk", q * scale, k.astype(q.dtype))
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", probs, v)
        out = out.reshape(*x.shape[:-1], c.embed_dim)
        x = x + nn.Dense(c.embed_dim, dtype=self.dtype, name="proj")(out)

        h = nn.LayerNorm(epsilon=c.eps, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(c.mlp_hidden, dtype=self.dtype, name="fc1")(h)
        h = ACTIVATIONS[c.hidden_act](h)
        x = x + nn.Dense(c.embed_dim, dtype=self.dtype, name="fc2")(h)
        return x


class Qwen2VLVisionTower(nn.Module):
    """Per-image vision encoder.

    Input: flattened patches (..., P, patch_dim) in spatial-merge raster
    order (what ``preprocess_image`` in models/qwen2vl_processor.py emits)
    plus the static (grid_h, grid_w).  Output: (..., P / merge^2, hidden_size)
    merged tokens for the LM.
    """

    cfg: Qwen2VLVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array, grid_hw: Tuple[int, int]) -> jax.Array:
        c = self.cfg
        grid_h, grid_w = grid_hw
        # Patch embedding == Conv3d with stride == kernel == one matmul.
        x = nn.Dense(c.embed_dim, use_bias=False, dtype=self.dtype, name="patch_embed")(
            patches.astype(self.dtype)
        )
        angles = vision_rope_angles(grid_h, grid_w, c.head_dim, c.spatial_merge_size)
        emb = jnp.concatenate([jnp.asarray(angles)] * 2, axis=-1)  # (P, head_dim)
        cos = jnp.cos(emb)[..., None, :]   # (P, 1, head_dim) fp32
        sin = jnp.sin(emb)[..., None, :]
        for i in range(c.depth):
            x = VisionBlock(c, dtype=self.dtype, name=f"blocks_{i}")(x, cos, sin)

        # PatchMerger: LN then group merge^2 neighbours -> MLP into LM width.
        x = nn.LayerNorm(epsilon=c.eps, dtype=self.dtype, name="merger_ln")(x)
        m2 = c.spatial_merge_size ** 2
        x = x.reshape(*x.shape[:-2], x.shape[-2] // m2, m2 * c.embed_dim)
        x = nn.Dense(m2 * c.embed_dim, dtype=self.dtype, name="merger_fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="merger_fc2")(x)


# ---------------------------------------------------------------------------
# Language model
# ---------------------------------------------------------------------------

def mrope_cos_sin(
    position_ids: jax.Array,    # (3, B, S) t/h/w positions
    head_dim: int,
    mrope_section: Sequence[int],
    theta: float,
) -> Tuple[jax.Array, jax.Array]:
    """Multimodal RoPE tables -> cos/sin (B, S, head_dim) fp32.

    Channel layout matches HF ``apply_multimodal_rotary_pos_emb``: the
    head_dim/2 frequency axis splits into (t, h, w) sections, duplicated for
    both rotary halves.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, np.float32) / head_dim))
    freqs = position_ids[..., None].astype(jnp.float32) * jnp.asarray(inv_freq)  # (3,B,S,half)
    sections = list(mrope_section)
    assert sum(sections) == half, (sections, half)
    chunks = []
    start = 0
    for i, sec in enumerate(sections):
        chunks.append(freqs[i, :, :, start : start + sec])
        start += sec
    sel = jnp.concatenate(chunks, axis=-1)           # (B, S, half)
    emb = jnp.concatenate([sel, sel], axis=-1)       # (B, S, head_dim)
    return jnp.cos(emb)[..., None, :], jnp.sin(emb)[..., None, :]  # (B,S,1,D)


class Qwen2DecoderLayer(nn.Module):
    cfg: Qwen2VLTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,               # (B, S, D)
        cos: jax.Array,
        sin: jax.Array,
        attn_bias: Optional[jax.Array],       # (B, 1, S, S_kv) additive
        cache: Optional[Tuple[jax.Array, jax.Array]] = None,  # (B, S_max, KV, hd)
        cache_index: Optional[jax.Array] = None,
    ):
        c = self.cfg
        hd, nh, nkv = c.head_dim, c.num_heads, c.num_kv_heads
        h = RMSNorm(c.rms_norm_eps, dtype=self.dtype, name="input_layernorm")(x)
        q = nn.Dense(nh * hd, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(nkv * hd, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(nkv * hd, dtype=self.dtype, name="v_proj")(h)
        b, s = x.shape[:2]
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nkv, hd)
        v = v.reshape(b, s, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)

        if cache is not None:
            k_cache, v_cache = cache
            k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, cache_index, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, cache_index, 0, 0))
            k_all, v_all = k_cache, v_cache
            new_cache = (k_cache, v_cache)
        else:
            k_all, v_all = k, v
            new_cache = None

        groups = nh // nkv
        qg = q.reshape(b, s, nkv, groups, hd)
        scale = hd ** -0.5
        logits = jnp.einsum("bqkgd,bmkd->bkgqm", qg * scale, k_all.astype(q.dtype))
        if attn_bias is not None:
            # attn_bias (B, 1, S, M) -> broadcast over (kv_heads, groups)
            logits = logits + attn_bias[:, :, None].astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bkgqm,bmkd->bqkgd", probs, v_all)
        out = out.reshape(b, s, nh * hd)
        x = x + nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype, name="o_proj")(out)

        h = RMSNorm(c.rms_norm_eps, dtype=self.dtype, name="post_attention_layernorm")(x)
        gate = nn.Dense(c.intermediate_size, use_bias=False, dtype=self.dtype, name="gate_proj")(h)
        up = nn.Dense(c.intermediate_size, use_bias=False, dtype=self.dtype, name="up_proj")(h)
        down = nn.Dense(
            c.hidden_size, use_bias=False, dtype=self.dtype, name="down_proj"
        )(nn.silu(gate) * up)
        return x + down, new_cache


class Qwen2VLModel(nn.Module):
    """Full VLM: embeds tokens, scatters vision features, runs the decoder."""

    cfg: Qwen2VLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        t = self.cfg.text
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
        if hasattr(self.cfg.vision, "window_size"):
            # Qwen2.5-VL vision variant (RMSNorm/SwiGLU/window attention).
            from tstar_tpu.models.qwen25_vision import Qwen25VisionTower

            self.vision = Qwen25VisionTower(
                self.cfg.vision, dtype=self.dtype, name="visual"
            )
        else:
            self.vision = Qwen2VLVisionTower(
                self.cfg.vision, dtype=self.dtype, name="visual"
            )

    def encode_images(self, patches: jax.Array, grid_hw: Tuple[int, int]) -> jax.Array:
        """(N_imgs, P, patch_dim) -> (N_imgs, P/merge^2, hidden)."""
        return jax.vmap(lambda p: self.vision(p, grid_hw))(patches)

    def embed(self, input_ids: jax.Array, image_embeds: Optional[jax.Array]) -> jax.Array:
        """Token embeddings with vision features scattered at image tokens.

        ``image_embeds`` is the flattened (num_image_tokens, hidden) feature
        stream; the k-th image token position (in sequence order) receives
        the k-th row, matching HF's masked_scatter.
        """
        x = self.embed_tokens(input_ids)
        if image_embeds is None:
            return x
        mask = input_ids == self.cfg.image_token_id          # (B, S)
        flat_mask = mask.reshape(-1)
        order = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1  # index into stream
        gathered = image_embeds[jnp.clip(order, 0, image_embeds.shape[0] - 1)]
        flat_x = x.reshape(-1, x.shape[-1])
        flat_x = jnp.where(flat_mask[:, None], gathered.astype(x.dtype), flat_x)
        return flat_x.reshape(x.shape)

    def decoder(
        self,
        hidden: jax.Array,
        position_ids: jax.Array,              # (3, B, S)
        attn_bias: Optional[jax.Array],
        caches: Optional[List] = None,
        cache_index: Optional[jax.Array] = None,
    ):
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
        input_ids: jax.Array,                  # (B, S)
        position_ids: jax.Array,               # (3, B, S)
        attention_mask: Optional[jax.Array] = None,   # (B, S) 1=real
        image_patches: Optional[jax.Array] = None,    # (N, P, patch_dim)
        image_grid_hw: Optional[Tuple[int, int]] = None,
    ) -> jax.Array:
        """Full forward -> logits (B, S, vocab).  Causal masking built in."""
        b, s = input_ids.shape
        image_embeds = None
        if image_patches is not None:
            enc = self.encode_images(image_patches, image_grid_hw)
            image_embeds = enc.reshape(-1, enc.shape[-1])
        hidden = self.embed(input_ids, image_embeds)

        neg = jnp.finfo(jnp.float32).min
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        bias = jnp.where(causal, 0.0, neg)
        if attention_mask is not None:
            pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
            bias = bias + pad
        hidden, _ = self.decoder(hidden, position_ids, bias)
        return self.logits(hidden)


# ---------------------------------------------------------------------------
# 3D rope position ids (host-side; HF get_rope_index equivalent)
# ---------------------------------------------------------------------------

def build_mrope_position_ids(
    input_ids: np.ndarray,            # (S,) single sequence, no padding
    image_token_id: int,
    grids_thw: Sequence[Tuple[int, int, int]],  # per image: (t, h, w) BEFORE merge
    spatial_merge_size: int = 2,
) -> np.ndarray:
    """(3, S) t/h/w position ids; text runs use equal positions continuing
    from max(previous) + 1; each image block uses its 3D grid positions."""
    s = len(input_ids)
    out = np.zeros((3, s), np.int64)
    img_iter = iter(grids_thw)
    pos = 0          # next text position
    i = 0
    while i < s:
        if input_ids[i] == image_token_id:
            t, h, w = next(img_iter)
            hh, ww = h // spatial_merge_size, w // spatial_merge_size
            n = t * hh * ww
            tt = np.repeat(np.arange(t), hh * ww)
            hp = np.tile(np.repeat(np.arange(hh), ww), t)
            wp = np.tile(np.arange(ww), t * hh)
            out[0, i : i + n] = pos + tt
            out[1, i : i + n] = pos + hp
            out[2, i : i + n] = pos + wp
            pos = out[:, i : i + n].max() + 1
            i += n
        else:
            out[:, i] = pos
            pos += 1
            i += 1
    return out


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def convert_hf_qwen2vl_state_dict(sd: Dict[str, Any], cfg: Qwen2VLConfig) -> Dict:
    """HF ``Qwen2VLForConditionalGeneration`` state dict -> Flax params."""

    def pick(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(names[0])

    def linear(*names, bias=True):
        w = pick(*names)
        out = {"kernel": _t(w).T}
        if bias:
            out["bias"] = _t(pick(*[n.replace(".weight", ".bias") for n in names]))
        return out

    def rms(*names):
        return {"scale": _t(pick(*names))}

    def ln(prefix_options):
        w = pick(*[p + ".weight" for p in prefix_options])
        b = pick(*[p + ".bias" for p in prefix_options])
        return {"scale": _t(w), "bias": _t(b)}

    v = cfg.vision
    # vision tower (HF prefixes: "visual." or "model.visual.")
    def vp(name):
        return (f"visual.{name}", f"model.visual.{name}")

    if hasattr(v, "window_size"):
        from tstar_tpu.models.qwen25_vision import convert_hf_qwen25_vision

        vision_params = convert_hf_qwen25_vision(sd, v)
        return _assemble_lm_params(sd, cfg, vision_params)

    vision_params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _t(pick(*vp("patch_embed.proj.weight"))).reshape(v.embed_dim, -1).T
        },
        "merger_ln": ln([p[:-7] for p in vp("merger.ln_q.weight")]),
        "merger_fc1": linear(*vp("merger.mlp.0.weight")),
        "merger_fc2": linear(*vp("merger.mlp.2.weight")),
    }
    for i in range(v.depth):
        vision_params[f"blocks_{i}"] = {
            "norm1": ln([p[:-7] for p in vp(f"blocks.{i}.norm1.weight")]),
            "norm2": ln([p[:-7] for p in vp(f"blocks.{i}.norm2.weight")]),
            "qkv": linear(*vp(f"blocks.{i}.attn.qkv.weight")),
            "proj": linear(*vp(f"blocks.{i}.attn.proj.weight")),
            "fc1": linear(*vp(f"blocks.{i}.mlp.fc1.weight")),
            "fc2": linear(*vp(f"blocks.{i}.mlp.fc2.weight")),
        }

    return _assemble_lm_params(sd, cfg, vision_params)


def _assemble_lm_params(sd: Dict[str, Any], cfg: Qwen2VLConfig, vision_params: Dict) -> Dict:
    def pick(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(names[0])

    def linear(*names, bias=True):
        w = pick(*names)
        out = {"kernel": _t(w).T}
        if bias:
            out["bias"] = _t(pick(*[n.replace(".weight", ".bias") for n in names]))
        return out

    def rms(*names):
        return {"scale": _t(pick(*names))}

    t = cfg.text

    def tp(name):
        return (
            f"model.language_model.{name}",
            f"language_model.model.{name}",
            f"model.{name}",
        )

    params: Dict[str, Any] = {
        "visual": vision_params,
        "embed_tokens": {"embedding": _t(pick(*tp("embed_tokens.weight")))},
        "norm": rms(*tp("norm.weight")),
    }
    for i in range(t.num_layers):
        lp = f"layers.{i}"
        params[f"layers_{i}"] = {
            "input_layernorm": rms(*tp(f"{lp}.input_layernorm.weight")),
            "post_attention_layernorm": rms(*tp(f"{lp}.post_attention_layernorm.weight")),
            "q_proj": linear(*tp(f"{lp}.self_attn.q_proj.weight")),
            "k_proj": linear(*tp(f"{lp}.self_attn.k_proj.weight")),
            "v_proj": linear(*tp(f"{lp}.self_attn.v_proj.weight")),
            "o_proj": linear(*tp(f"{lp}.self_attn.o_proj.weight"), bias=False),
            "gate_proj": linear(*tp(f"{lp}.mlp.gate_proj.weight"), bias=False),
            "up_proj": linear(*tp(f"{lp}.mlp.up_proj.weight"), bias=False),
            "down_proj": linear(*tp(f"{lp}.mlp.down_proj.weight"), bias=False),
        }
    if not t.tie_word_embeddings:
        params["lm_head"] = {"kernel": _t(pick("lm_head.weight")).T}
    return {"params": params}
