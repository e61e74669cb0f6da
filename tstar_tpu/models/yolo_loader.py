"""mmdet/mmyolo YOLO-World v2 checkpoint -> Flax converter.

Loads the reference's production detector checkpoint format
(``install.sh:23``: ``yolo_world_v2_xl_obj365v1_goldg_cc3mlite_pretrain-
5daf1395.pth``; wired at ``TStarFramework.py:181-183`` through mmdet
``init_detector``).  ``torch.load`` of the state dict needs NO mmdet/mmcv —
this module maps mmyolo tensor names onto the structurally-mirrored Flax
graph in models/yoloworld.py, folding every BatchNorm into inference-time
scale/bias.

Name map (mmyolo YOLO-World v2 `state_dict` -> Flax params):

  backbone.image_model.stem.{conv,bn}            -> stem
  backbone.image_model.stage{i}.0.{conv,bn}      -> stage{i}_down
  backbone.image_model.stage{i}.1.*              -> stage{i}_csp
      (main_conv / blocks.{j}.conv1|conv2 / final_conv)
  backbone.image_model.stage4.2.{conv1,conv2}    -> sppf
  neck.top_down_layers.{k}.*                     -> top_down{k}
  neck.bottom_up_layers.{k}.*                    -> bottom_up{k}
      (+ attn_block.{guide_fc,bias,project_conv[,embed_conv]})
  neck.downsample_layers.{k}.{conv,bn}           -> downsample{k}
  bbox_head.head_module.cls_preds.{l}.{0,1,2}    -> cls_pred{l}_{0,1,2}
  bbox_head.head_module.reg_preds.{l}.{0,1,2}    -> reg_pred{l}_{0,1,2}
  bbox_head.head_module.cls_contrasts.{l}.*      -> contrast{l}_* (BN folded)
  backbone.text_model.model.text_model.*         -> YoloTextEncoder.text
  backbone.text_model.model.text_projection      -> YoloTextEncoder.text_projection

Validation: every checkpoint tensor must be consumed exactly once (ignored
buffers are an explicit allowlist), and the converted tree must match the
Flax model's ``jax.eval_shape`` init tree leaf-for-leaf — shape-complete by
construction.  Numerical parity of the graph itself is tested against a
tiny hand-built torch replica of the mmyolo module graph
(tests/test_yolo_loader.py), following the offline pattern of
tests/test_owlvit.py.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # mmyolo norm_cfg dict(type='BN', momentum=0.03, eps=0.001)

# Non-parameter checkpoint entries that are correct to drop.
_IGNORED_SUFFIXES = ("num_batches_tracked",)
_IGNORED_KEYS = (
    "bbox_head.head_module.proj",          # DFL arange buffer (recomputed)
)
_IGNORED_PREFIXES = (
    "data_preprocessor.",                  # mean/std buffers (we use /255)
)


class ConversionError(ValueError):
    pass


class _TrackedDict:
    """State-dict wrapper that records consumption for exactly-once checks."""

    def __init__(self, sd: Dict[str, Any]):
        self.sd = sd
        self.used: set = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise ConversionError(f"checkpoint is missing tensor {key!r}")
        if key in self.used:
            raise ConversionError(f"tensor {key!r} consumed twice")
        self.used.add(key)
        x = self.sd[key]
        return np.asarray(
            x.detach().cpu().numpy() if hasattr(x, "detach") else x
        ).astype(np.float32)

    def has(self, key: str) -> bool:
        return key in self.sd

    def leftovers(self) -> List[str]:
        out = []
        for k in self.sd:
            if k in self.used:
                continue
            if k.endswith(_IGNORED_SUFFIXES) or k in _IGNORED_KEYS:
                continue
            if any(k.startswith(p) for p in _IGNORED_PREFIXES):
                continue
            if k.endswith("position_ids"):   # HF CLIP buffer
                continue
            out.append(k)
        return out


def _conv(sd: _TrackedDict, prefix: str) -> Dict:
    """torch Conv2d (O,I,kh,kw) -> flax kernel (kh,kw,I,O)."""
    return {"kernel": sd.take(f"{prefix}.weight").transpose(2, 3, 1, 0)}


def _fold_bn(sd: _TrackedDict, prefix: str, eps: float = BN_EPS):
    gamma = sd.take(f"{prefix}.weight")
    beta = sd.take(f"{prefix}.bias")
    mean = sd.take(f"{prefix}.running_mean")
    var = sd.take(f"{prefix}.running_var")
    scale = gamma / np.sqrt(var + eps)
    return scale, beta - mean * scale


def _convbn(sd: _TrackedDict, prefix: str) -> Dict:
    """mmyolo ConvModule (conv + BN) -> ConvBN params with folded BN."""
    scale, bias = _fold_bn(sd, f"{prefix}.bn")
    return {"conv": _conv(sd, f"{prefix}.conv"), "bn_scale": scale, "bn_bias": bias}


def _conv_bias(sd: _TrackedDict, prefix: str) -> Dict:
    """torch Conv2d with bias (the final 1x1 head convs)."""
    return {
        "kernel": sd.take(f"{prefix}.weight").transpose(2, 3, 1, 0),
        "bias": sd.take(f"{prefix}.bias"),
    }


def _csp(sd: _TrackedDict, prefix: str, depth: int) -> Dict:
    out = {
        "main_conv": _convbn(sd, f"{prefix}.main_conv"),
        "final_conv": _convbn(sd, f"{prefix}.final_conv"),
    }
    for j in range(depth):
        out[f"blocks_{j}"] = {
            "conv1": _convbn(sd, f"{prefix}.blocks.{j}.conv1"),
            "conv2": _convbn(sd, f"{prefix}.blocks.{j}.conv2"),
        }
    return out


def _max_sigmoid_csp(sd: _TrackedDict, prefix: str, depth: int) -> Dict:
    out = _csp(sd, prefix, depth)
    ap = f"{prefix}.attn_block"
    attn = {
        "guide_fc": {
            "kernel": sd.take(f"{ap}.guide_fc.weight").T,
            "bias": sd.take(f"{ap}.guide_fc.bias"),
        },
        "bias": sd.take(f"{ap}.bias"),
        "project_conv": _convbn(sd, f"{ap}.project_conv"),
    }
    if sd.has(f"{ap}.embed_conv.conv.weight"):
        attn["embed_conv"] = _convbn(sd, f"{ap}.embed_conv")
    out["attn_block"] = attn
    return out


def convert_mmyolo_yolo_world_state_dict(
    raw_sd: Dict[str, Any], cfg, strict: bool = True
) -> Tuple[Dict, Dict]:
    """-> ({"params": detector}, {"params": text_encoder}).

    ``cfg`` is the YoloWorldConfig matching the checkpoint architecture
    (yoloworld_xl() for the reference checkpoint).
    """
    sd = _TrackedDict(raw_sd)
    bb = "backbone.image_model"
    p: Dict[str, Any] = {"stem": _convbn(sd, f"{bb}.stem")}
    for i, depth in enumerate(cfg.depths, start=1):
        p[f"stage{i}_down"] = _convbn(sd, f"{bb}.stage{i}.0")
        p[f"stage{i}_csp"] = _csp(sd, f"{bb}.stage{i}.1", depth)
    p["sppf"] = {
        "conv1": _convbn(sd, f"{bb}.stage4.2.conv1"),
        "conv2": _convbn(sd, f"{bb}.stage4.2.conv2"),
    }
    for k in range(2):
        p[f"top_down{k}"] = _max_sigmoid_csp(
            sd, f"neck.top_down_layers.{k}", cfg.neck_depth
        )
        p[f"bottom_up{k}"] = _max_sigmoid_csp(
            sd, f"neck.bottom_up_layers.{k}", cfg.neck_depth
        )
        p[f"downsample{k}"] = _convbn(sd, f"neck.downsample_layers.{k}")
    hm = "bbox_head.head_module"
    for l in range(3):
        for b in range(2):
            p[f"cls_pred{l}_{b}"] = _convbn(sd, f"{hm}.cls_preds.{l}.{b}")
            p[f"reg_pred{l}_{b}"] = _convbn(sd, f"{hm}.reg_preds.{l}.{b}")
        p[f"cls_pred{l}_2"] = _conv_bias(sd, f"{hm}.cls_preds.{l}.2")
        p[f"reg_pred{l}_2"] = _conv_bias(sd, f"{hm}.reg_preds.{l}.2")
        cc = f"{hm}.cls_contrasts.{l}"
        bn_scale, bn_bias = _fold_bn(sd, f"{cc}.norm")
        p[f"contrast{l}_bn_scale"] = bn_scale
        p[f"contrast{l}_bn_bias"] = bn_bias
        p[f"contrast{l}_bias"] = sd.take(f"{cc}.bias").reshape(())
        p[f"contrast{l}_logit_scale"] = sd.take(f"{cc}.logit_scale").reshape(())

    # ---- text tower (HF CLIPTextModelWithProjection inside the backbone) ----
    tm = "backbone.text_model.model"

    def linear(prefix):
        return {
            "kernel": sd.take(f"{prefix}.weight").T,
            "bias": sd.take(f"{prefix}.bias"),
        }

    def layernorm(prefix):
        return {"scale": sd.take(f"{prefix}.weight"),
                "bias": sd.take(f"{prefix}.bias")}

    t = f"{tm}.text_model"
    n_layers = 0
    while sd.has(f"{t}.encoder.layers.{n_layers}.layer_norm1.weight"):
        n_layers += 1
    if n_layers == 0:
        raise ConversionError(
            "no CLIP text layers found under backbone.text_model.model — "
            "is this a YOLO-World checkpoint?"
        )
    encoder = {}
    for i in range(n_layers):
        lp = f"{t}.encoder.layers.{i}"
        encoder[f"layers_{i}"] = {
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
    text_params = {
        "text": {
            "token_embedding": sd.take(f"{t}.embeddings.token_embedding.weight"),
            "position_embedding": sd.take(
                f"{t}.embeddings.position_embedding.weight"
            ),
            "encoder": encoder,
            "final_layer_norm": layernorm(f"{t}.final_layer_norm"),
        },
        "text_projection": {"kernel": sd.take(f"{tm}.text_projection.weight").T},
    }

    if strict:
        left = sd.leftovers()
        if left:
            raise ConversionError(
                f"{len(left)} checkpoint tensors were not consumed "
                f"(first 10: {left[:10]}); architecture/config mismatch?"
            )
    return {"params": p}, {"params": text_params}


def _assert_tree_matches(converted: Dict, shape_tree: Dict, what: str):
    """Converted tree must match the model's eval_shape init leaf-for-leaf."""

    def keyname(path):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )

    exp_flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(shape_tree)[0]:
        exp_flat[keyname(path)] = tuple(leaf.shape)
    conv_flat = {
        keyname(path): tuple(np.asarray(leaf).shape)
        for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    missing = sorted(set(exp_flat) - set(conv_flat))
    extra = sorted(set(conv_flat) - set(exp_flat))
    if missing or extra:
        raise ConversionError(
            f"{what}: converted tree mismatch; missing={missing[:8]} "
            f"extra={extra[:8]}"
        )
    bad = [
        (k, conv_flat[k], exp_flat[k])
        for k in exp_flat
        if conv_flat[k] != exp_flat[k]
    ]
    if bad:
        raise ConversionError(f"{what}: shape mismatches {bad[:8]}")


def validate_converted_shapes(cfg, text_cfg, variables, text_variables):
    """Structural check: converted params == eval_shape(init) trees."""
    from tstar_tpu.models.yoloworld import YoloTextEncoder, YoloWorldDetector

    model = YoloWorldDetector(cfg)
    det_shapes = jax.eval_shape(
        model.init,
        jax.random.key(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32),
        jnp.zeros((2, cfg.text_dim), jnp.float32),
    )
    _assert_tree_matches(variables, det_shapes, "detector")
    tenc = YoloTextEncoder(text_cfg, projection_dim=cfg.text_dim)
    # position_embedding length comes from the checkpoint (77 for CLIP);
    # text_cfg.max_length must equal it (see _infer_text_config) so the
    # init'd param shape matches the converted tensor.
    seq = text_cfg.max_length
    text_shapes = jax.eval_shape(
        tenc.init,
        jax.random.key(0),
        jnp.zeros((2, seq), jnp.int32),
        jnp.ones((2, seq), jnp.int32),
    )
    _assert_tree_matches(text_variables, text_shapes, "text encoder")


def _infer_text_config(text_variables):
    """Recover the CLIP text config from converted tensor shapes.

    Head count is not recoverable from fused projection weights; CLIP-family
    towers use 64-dim heads (CLIP-base: 512 hidden -> 8 heads), so infer
    hidden // 64 (floored at 1 for tiny test towers).  max_length comes from
    the checkpoint's position embedding (77 for real CLIP) — the TextTower
    param shape must match the converted tensor."""
    from tstar_tpu.models.owlvit import TextConfig

    t = text_variables["params"]["text"]
    vocab, hidden = np.asarray(t["token_embedding"]).shape
    return TextConfig(
        vocab_size=int(vocab),
        hidden_size=int(hidden),
        num_layers=len(t["encoder"]),
        num_heads=max(1, int(hidden) // 64),
        intermediate_size=int(
            np.asarray(t["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"]).shape[1]
        ),
        max_length=int(np.asarray(t["position_embedding"]).shape[0]),
    )


def load_yolo_world_checkpoint(
    checkpoint_dir: str, size: str = "xl", dtype=jnp.bfloat16
):
    """Load a YOLO-World checkpoint directory.

    The directory holds either
      * an mmdet/mmyolo ``.pth`` (reference format) + CLIP tokenizer files
        (``vocab.json``/``merges.txt`` from openai/clip-vit-base-patch32 —
        the tokenizer is not inside the .pth); or
      * native ``yolo_world.npz`` / ``text_tower.npz`` Flax checkpoints.

    -> (model, variables, text_model, text_variables, tokenizer).
    """
    from tstar_tpu.models.clip_tokenizer import ClipTokenizer
    from tstar_tpu.models.owlvit import TextConfig
    from tstar_tpu.models.yoloworld import (
        YoloTextEncoder,
        YoloWorldDetector,
        yoloworld_small,
        yoloworld_xl,
    )

    cfg = yoloworld_small() if size == "small" else yoloworld_xl()
    pths = [f for f in os.listdir(checkpoint_dir) if f.endswith(".pth")]
    if pths:
        import torch

        path = os.path.join(checkpoint_dir, sorted(pths)[0])
        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
        raw_sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
        variables, text_variables = convert_mmyolo_yolo_world_state_dict(
            raw_sd, cfg
        )
        text_cfg = _infer_text_config(text_variables)
        validate_converted_shapes(cfg, text_cfg, variables, text_variables)
    else:
        from tstar_tpu.models.loader import load_flax_params

        variables = load_flax_params(checkpoint_dir, "yolo_world.npz")
        text_variables = load_flax_params(checkpoint_dir, "text_tower.npz")
        text_cfg = _infer_text_config(text_variables)

    model = YoloWorldDetector(cfg, dtype=dtype)
    text_model = YoloTextEncoder(text_cfg, projection_dim=cfg.text_dim, dtype=dtype)
    tokenizer = ClipTokenizer.from_dir(checkpoint_dir, context=text_cfg.max_length)
    return model, variables, text_model, text_variables, tokenizer
