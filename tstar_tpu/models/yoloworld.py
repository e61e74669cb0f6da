"""YOLO-World v2 open-vocabulary detector in Flax.

TPU-native counterpart of the reference's higher-accuracy heuristic backend
(``TStar/interface_heuristic.py:39-190``: mmdet/mmyolo YOLO-World v2-XL with
``reparameterize(texts)`` text conditioning, score threshold 0.12 and
max_dets 50 in the search path ``:136-168``; checkpoint
``yolo_world_v2_xl_obj365v1_goldg_cc3mlite_pretrain-5daf1395.pth`` +
config ``yolo_world_v2_xl_vlpan_bn_...lvis_minival.py``,
``TStarFramework.py:181-183``, ``install.sh:23``).

The module graph mirrors the mmyolo/YOLO-World v2 architecture structurally
(so real checkpoints convert tensor-for-tensor; see models/yolo_loader.py):

  * **backbone** — YOLOv8 CSPDarknet: ConvBN(SiLU) stem, per-stage
    downsample + CSPLayerWithTwoConv (split/bottlenecks/concat/fuse), SPPF
    on the last stage; XL dims widths (80,160,320,640,640), depths
    (3,6,6,3) (yolov8-x: deepen 1.0 / widen 1.25).
  * **neck** — YOLOWorldPAFPN: top-down + bottom-up CSP fusion where every
    fusion block is a ``MaxSigmoidCSPLayerWithTwoConv``: the standard CSP
    split/blocks plus an extra branch that projects the last block output
    (conv+BN, no act) and gates it per-head with
    ``sigmoid(max_text(embed . guide) / sqrt(head_c) + bias)`` against the
    text embeddings, all (3+n) branches concatenated into the fuse conv.
  * **head** — YOLOv8-style decoupled head with *shared* branch widths
    (cls: max(in0, min(nc,100)); reg: max(in0//4, 16, 4*reg_max)); the reg
    branch ends in a DFL distribution (softmax-expectation decode to
    l/t/r/b distances at (x+0.5)*stride anchor points); the cls branch ends
    in an ``embed_dims`` projection scored by a **BN contrastive head**
    (BatchNorm over embeddings, dot with L2-normalized text,
    ``* exp(logit_scale) + bias`` — the v2 replacement for the v1 L2-norm
    head).
  * **text** — the shared CLIP text tower (models/owlvit.py TextTower) +
    ``text_projection`` + L2 normalize (HuggingCLIPLanguageBackbone over
    CLIPTextModelWithProjection), computed ONCE per video, mirroring
    ``reparameterize_object_list``.

Inference form: every BatchNorm is folded into per-channel scale/bias
(``bn_scale``/``bn_bias`` params; fold happens in the checkpoint converter).
Inputs are RGB in [0,1] (the mmyolo YOLOv5DetDataPreprocessor mean 0 /
std 255); the scorer composes grid cells directly on a square 640 canvas,
which replaces the reference pipeline's letterbox-resize of the grid image.

Fixed-shape post-processing: sigmoid scores, score threshold, class-aware
NMS (ops/nms.py), top-``max_dets``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class YoloWorldConfig:
    # XL = yolov8-x scaled dims (deepen 1.0, widen 1.25)
    widths: Tuple[int, ...] = (80, 160, 320, 640, 640)   # stem + 4 stages
    depths: Tuple[int, ...] = (3, 6, 6, 3)               # bottlenecks/stage
    neck_depth: int = 3                                  # CSP blocks per fusion
    # Per-level MaxSigmoid attention dims, already widen-scaled
    # (config neck_embed_channels [128,256,256] / neck_num_heads [4,8,8]
    # x 1.25): indexed like mmyolo embed_channels[idx-1] / [idx+1].
    neck_embed: Tuple[int, int, int] = (160, 320, 320)
    neck_heads: Tuple[int, int, int] = (5, 10, 10)
    text_dim: int = 512           # guide_channels == head embed_dims
    reg_max: int = 16             # DFL bins
    strides: Tuple[int, ...] = (8, 16, 32)
    image_size: int = 640
    num_classes: int = 100        # only bounds the cls branch width
    score_threshold: float = 0.12   # search-path default (:136)
    nms_iou: float = 0.7
    max_dets: int = 50              # search-path default (:136)

    @property
    def cls_branch_width(self) -> int:
        # mmyolo YOLOv8HeadModule._init_layers
        return max(self.widths[2], min(self.num_classes, 100))

    @property
    def reg_branch_width(self) -> int:
        return max(self.widths[2] // 4, 16, self.reg_max * 4)


def yoloworld_xl() -> YoloWorldConfig:
    """The reference's production checkpoint architecture."""
    return YoloWorldConfig()


def yoloworld_small() -> YoloWorldConfig:
    """Tiny variant for tests/benchmarks (same graph, small dims)."""
    return YoloWorldConfig(
        widths=(16, 32, 64, 128, 128),
        depths=(1, 1, 1, 1),
        neck_depth=1,
        neck_embed=(32, 64, 64),
        neck_heads=(2, 4, 4),
        text_dim=64,
        image_size=160,
    )


class ConvBN(nn.Module):
    """Conv + folded-BN affine (+ optional SiLU) — mmyolo ConvModule in
    inference form (BN folded by the converter)."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), (self.stride, self.stride),
            padding="SAME", use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        x = x * scale.astype(self.dtype) + bias.astype(self.dtype)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    """mmyolo DarknetBottleneck(expansion=1, kernels (3,3))."""

    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBN(self.features, 3, dtype=self.dtype, name="conv1")(x)
        h = ConvBN(self.features, 3, dtype=self.dtype, name="conv2")(h)
        return x + h if self.shortcut and x.shape[-1] == self.features else h


class CSPLayer(nn.Module):
    """mmyolo CSPLayerWithTwoConv: split, run bottlenecks, concat, fuse."""

    features: int
    depth: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.features // 2
        y = ConvBN(2 * mid, 1, dtype=self.dtype, name="main_conv")(x)
        a, b = y[..., :mid], y[..., mid:]
        outs = [a, b]
        for i in range(self.depth):
            b = Bottleneck(mid, self.shortcut, dtype=self.dtype, name=f"blocks_{i}")(b)
            outs.append(b)
        return ConvBN(self.features, 1, dtype=self.dtype, name="final_conv")(
            jnp.concatenate(outs, -1)
        )


class SPPF(nn.Module):
    """mmyolo SPPFBottleneck (k=5 x3 sequential poolings)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBN(x.shape[-1] // 2, 1, dtype=self.dtype, name="conv1")(x)
        pools = [h]
        for _ in range(3):
            pools.append(
                nn.max_pool(pools[-1], (5, 5), strides=(1, 1), padding="SAME")
            )
        return ConvBN(self.features, 1, dtype=self.dtype, name="conv2")(
            jnp.concatenate(pools, -1)
        )


class MaxSigmoidAttnBlock(nn.Module):
    """mmyolo/yolo_world MaxSigmoidAttnBlock (inference form, with_scale=False).

    x (B, H, W, C_in) + guide (T, guide_dim) -> (B, H, W, C_out):
      guide' = guide_fc(guide)                         (T, embed)
      embed  = embed_conv(x) if embed != C_in else x   (B, H, W, embed)
      attn   = sigmoid(max_T(embed . guide' per head) / sqrt(head_c) + bias)
      out    = project_conv(x) * attn (broadcast per head)
    """

    features: int            # C_out
    embed: int               # embed_channels
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide):
        c_in = x.shape[-1]
        head_c = self.embed // self.num_heads
        g = nn.Dense(self.embed, dtype=self.dtype, name="guide_fc")(
            guide.astype(self.dtype)
        )                                                   # (T, embed)
        g = g.reshape(-1, self.num_heads, head_c)           # (T, M, c)
        e = x
        if self.embed != c_in:
            e = ConvBN(self.embed, 1, act=False, dtype=self.dtype,
                       name="embed_conv")(x)
        b, h, w, _ = e.shape
        e = e.reshape(b, h, w, self.num_heads, head_c)
        logit = jnp.einsum("bhwmc,tmc->bhwmt", e, g)
        logit = jnp.max(logit, -1) / np.sqrt(head_c)         # (B, H, W, M)
        bias = self.param("bias", nn.initializers.zeros, (self.num_heads,))
        gate = jax.nn.sigmoid(logit + bias.astype(self.dtype))
        p = ConvBN(self.features, 3, act=False, dtype=self.dtype,
                   name="project_conv")(x)
        p = p.reshape(b, h, w, self.num_heads, self.features // self.num_heads)
        p = p * gate[..., None]
        return p.reshape(b, h, w, self.features)


class MaxSigmoidCSPLayer(nn.Module):
    """mmyolo/yolo_world MaxSigmoidCSPLayerWithTwoConv: CSP whose fuse conv
    additionally sees the text-gated projection of the last block output
    ((3+n)*mid inputs)."""

    features: int
    depth: int
    embed: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide):
        mid = self.features // 2
        y = ConvBN(2 * mid, 1, dtype=self.dtype, name="main_conv")(x)
        a, b = y[..., :mid], y[..., mid:]
        outs = [a, b]
        for i in range(self.depth):
            # neck fusion blocks: add_identity=False
            b = Bottleneck(mid, shortcut=False, dtype=self.dtype,
                           name=f"blocks_{i}")(b)
            outs.append(b)
        outs.append(
            MaxSigmoidAttnBlock(
                mid, self.embed, self.num_heads, dtype=self.dtype,
                name="attn_block",
            )(b, guide)
        )
        return ConvBN(self.features, 1, dtype=self.dtype, name="final_conv")(
            jnp.concatenate(outs, -1)
        )


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


class YoloWorldDetector(nn.Module):
    cfg: YoloWorldConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, pixels: jax.Array, text_embeds: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """pixels (B, S, S, 3) RGB in [0,1]; text (T, text_dim) L2-normalized
        projected CLIP embeddings.

        Returns (logits (B, A, T) f32 pre-sigmoid, boxes_xyxy (B, A, 4) f32
        in pixels) over all anchors A = sum((S/stride)^2).
        """
        c = self.cfg
        w = c.widths
        guide = text_embeds.astype(self.dtype)

        # ---- backbone (YOLOv8 CSPDarknet, out stages 2/3/4) ----
        x = ConvBN(w[0], 3, 2, dtype=self.dtype, name="stem")(
            pixels.astype(self.dtype)
        )
        feats: List[jax.Array] = []
        for i, (width, depth) in enumerate(zip(w[1:], c.depths)):
            x = ConvBN(width, 3, 2, dtype=self.dtype, name=f"stage{i + 1}_down")(x)
            x = CSPLayer(width, depth, dtype=self.dtype, name=f"stage{i + 1}_csp")(x)
            if i == 3:
                x = SPPF(width, dtype=self.dtype, name="sppf")(x)
            if i >= 1:
                feats.append(x)          # strides 8, 16, 32
        p3, p4, p5 = feats

        # ---- neck (YOLOWorldPAFPN; embed/heads indexed per mmyolo) ----
        e, m = c.neck_embed, c.neck_heads
        t4 = MaxSigmoidCSPLayer(
            w[3], c.neck_depth, e[1], m[1], dtype=self.dtype, name="top_down0",
        )(jnp.concatenate([_upsample2(p5), p4], -1), guide)
        t3 = MaxSigmoidCSPLayer(
            w[2], c.neck_depth, e[0], m[0], dtype=self.dtype, name="top_down1",
        )(jnp.concatenate([_upsample2(t4), p3], -1), guide)
        d3 = ConvBN(w[2], 3, 2, dtype=self.dtype, name="downsample0")(t3)
        b4 = MaxSigmoidCSPLayer(
            w[3], c.neck_depth, e[1], m[1], dtype=self.dtype, name="bottom_up0",
        )(jnp.concatenate([d3, t4], -1), guide)
        d4 = ConvBN(w[3], 3, 2, dtype=self.dtype, name="downsample1")(b4)
        b5 = MaxSigmoidCSPLayer(
            w[4], c.neck_depth, e[2], m[2], dtype=self.dtype, name="bottom_up1",
        )(jnp.concatenate([d4, p5], -1), guide)

        # ---- head (shared branch widths; DFL box + BN contrastive cls) ----
        text_n = text_embeds / (
            jnp.linalg.norm(text_embeds, axis=-1, keepdims=True) + 1e-12
        )
        cls_w, reg_w = c.cls_branch_width, c.reg_branch_width
        all_logits, all_boxes = [], []
        for li, (feat, stride) in enumerate(zip([t3, b4, b5], c.strides)):
            h = ConvBN(reg_w, 3, dtype=self.dtype, name=f"reg_pred{li}_0")(feat)
            h = ConvBN(reg_w, 3, dtype=self.dtype, name=f"reg_pred{li}_1")(h)
            dfl = nn.Conv(4 * c.reg_max, (1, 1), dtype=self.dtype,
                          name=f"reg_pred{li}_2")(h)

            h = ConvBN(cls_w, 3, dtype=self.dtype, name=f"cls_pred{li}_0")(feat)
            h = ConvBN(cls_w, 3, dtype=self.dtype, name=f"cls_pred{li}_1")(h)
            emb = nn.Conv(c.text_dim, (1, 1), dtype=self.dtype,
                          name=f"cls_pred{li}_2")(h)
            # BNContrastiveHead (v2): folded BN over embeddings, dot with
            # normalized text, * exp(logit_scale) + bias.
            bn_s = self.param(f"contrast{li}_bn_scale",
                              nn.initializers.ones, (c.text_dim,))
            bn_b = self.param(f"contrast{li}_bn_bias",
                              nn.initializers.zeros, (c.text_dim,))
            emb = emb.astype(jnp.float32) * bn_s + bn_b
            logit_scale = self.param(f"contrast{li}_logit_scale",
                                     nn.initializers.constant(-1.0), ())
            logit_bias = self.param(f"contrast{li}_bias",
                                    nn.initializers.zeros, ())
            logits = (
                jnp.einsum("bhwc,tc->bhwt", emb, text_n.astype(jnp.float32))
                * jnp.exp(logit_scale) + logit_bias
            )

            # DFL decode: expectation over bins -> l/t/r/b in stride units,
            # anchor points at (x + 0.5) * stride (MlvlPointGenerator).
            b, hh, ww, _ = dfl.shape
            dist = dfl.reshape(b, hh, ww, 4, c.reg_max)
            bins = jnp.arange(c.reg_max, dtype=jnp.float32)
            ltrb = jnp.einsum(
                "bhwkr,r->bhwk", jax.nn.softmax(dist.astype(jnp.float32), -1), bins
            )
            cy, cx = jnp.meshgrid(
                jnp.arange(hh, dtype=jnp.float32) + 0.5,
                jnp.arange(ww, dtype=jnp.float32) + 0.5,
                indexing="ij",
            )
            x0 = (cx - ltrb[..., 0]) * stride
            y0 = (cy - ltrb[..., 1]) * stride
            x1 = (cx + ltrb[..., 2]) * stride
            y1 = (cy + ltrb[..., 3]) * stride
            boxes = jnp.stack([x0, y0, x1, y1], -1)

            all_logits.append(logits.reshape(b, hh * ww, -1).astype(jnp.float32))
            all_boxes.append(boxes.reshape(b, hh * ww, 4))
        return jnp.concatenate(all_logits, 1), jnp.concatenate(all_boxes, 1)


class YoloTextEncoder(nn.Module):
    """HuggingCLIPLanguageBackbone: CLIP text tower + projection + L2 norm."""

    text_cfg: "TextConfig"          # models/owlvit.py TextConfig
    projection_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        from tstar_tpu.models.owlvit import TextTower

        pooled = TextTower(self.text_cfg, dtype=self.dtype, name="text")(
            input_ids, attention_mask
        )
        proj = nn.Dense(self.projection_dim, use_bias=False, dtype=self.dtype,
                        name="text_projection")(pooled)
        proj = proj.astype(jnp.float32)
        return proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-12)


def postprocess_yolo(
    logits: jax.Array,      # (B, A, T)
    boxes: jax.Array,       # (B, A, 4)
    query_mask: Optional[jax.Array],
    score_threshold: float = 0.12,
    nms_iou: float = 0.7,
    max_dets: int = 50,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """-> (scores (B, max_dets), class_ids, boxes_xyxy, keep mask).

    Mirrors the reference's search-path post-processing
    (interface_heuristic.py:143-165: threshold, per-class NMS in test_step,
    top-max_dets).
    """
    from tstar_tpu.ops.nms import batched_class_nms

    if query_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(query_mask[None, None, :], logits, neg)
    probs = jax.nn.sigmoid(logits)
    scores = jnp.max(probs, -1)
    class_ids = jnp.argmax(probs, -1).astype(jnp.int32)

    def one(s, c, b):
        s = jnp.where(s > score_threshold, s, 0.0)
        keep, valid = batched_class_nms(b, s, c, nms_iou, max_dets)
        out_s = s[keep] * valid
        return out_s, c[keep], b[keep], valid & (out_s > score_threshold)

    return jax.vmap(one)(scores, class_ids, boxes)
