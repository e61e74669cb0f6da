"""mmyolo YOLO-World v2 checkpoint converter: structure + numerical parity.

No mmdet/mmyolo/checkpoints exist in this environment (zero egress), so the
validation target is a tiny hand-built plain-torch replica of the mmyolo
module graph producing the exact mmyolo ``state_dict`` key layout
(the offline pattern of tests/test_owlvit.py): ConvModule (conv+BN+SiLU),
CSPLayerWithTwoConv, MaxSigmoidCSPLayerWithTwoConv + MaxSigmoidAttnBlock,
SPPFBottleneck, YOLOv8 backbone/PAFPN wiring, the YOLO-World head with
BNContrastiveHead, and HF CLIPTextModelWithProjection as the text model.

Sources mirrored (public): mmyolo models/layers/yolo_bricks.py +
models/backbones/csp_darknet.py + models/dense_heads/yolov8_head.py;
YOLO-World yolo_world/models/layers/yolo_bricks.py +
dense_heads/yolo_world_head.py + necks/yolo_world_pafpn.py.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tstar_tpu.models.yolo_loader import (  # noqa: E402
    ConversionError,
    convert_mmyolo_yolo_world_state_dict,
    validate_converted_shapes,
)
from tstar_tpu.models.yoloworld import (  # noqa: E402
    YoloTextEncoder,
    YoloWorldConfig,
    YoloWorldDetector,
)

# ---------------------------------------------------------------------------
# Plain-torch replica of the mmyolo module graph (names == mmyolo state_dict)
# ---------------------------------------------------------------------------


class ConvModule(nn.Module):
    def __init__(self, c_in, c_out, k, s=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c_out, eps=1e-3, momentum=0.03)
        self._act = act

    def forward(self, x):
        y = self.bn(self.conv(x))
        return F.silu(y) if self._act else y


class DarknetBottleneck(nn.Module):
    def __init__(self, c, add_identity=True):
        super().__init__()
        self.conv1 = ConvModule(c, c, 3)
        self.conv2 = ConvModule(c, c, 3)
        self.add = add_identity

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        return x + y if self.add else y


class CSPLayerWithTwoConv(nn.Module):
    def __init__(self, c_in, c_out, n, add_identity=True):
        super().__init__()
        self.mid = c_out // 2
        self.main_conv = ConvModule(c_in, 2 * self.mid, 1)
        self.blocks = nn.ModuleList(
            DarknetBottleneck(self.mid, add_identity) for _ in range(n)
        )
        self.final_conv = ConvModule((2 + n) * self.mid, c_out, 1)

    def forward(self, x):
        y = self.main_conv(x)
        outs = list(y.split((self.mid, self.mid), 1))
        for b in self.blocks:
            outs.append(b(outs[-1]))
        return self.final_conv(torch.cat(outs, 1))


class MaxSigmoidAttnBlock(nn.Module):
    def __init__(self, c_in, c_out, guide_c, embed_c, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_c = embed_c // num_heads
        if embed_c != c_in:
            self.embed_conv = ConvModule(c_in, embed_c, 1, act=False)
        else:
            self.embed_conv = None
        self.guide_fc = nn.Linear(guide_c, embed_c)
        self.bias = nn.Parameter(torch.zeros(num_heads))
        self.project_conv = ConvModule(c_in, c_out, 3, act=False)

    def forward(self, x, guide):
        b, _, h, w = x.shape
        g = self.guide_fc(guide)                          # (T, embed)
        g = g.reshape(1, -1, self.num_heads, self.head_c)
        e = self.embed_conv(x) if self.embed_conv is not None else x
        e = e.reshape(b, self.num_heads, self.head_c, h, w)
        attn = torch.einsum("bmchw,bnmc->bmhwn", e, g.expand(b, -1, -1, -1))
        attn = attn.max(dim=-1)[0] / (self.head_c ** 0.5)
        attn = (attn + self.bias[None, :, None, None]).sigmoid()
        x = self.project_conv(x)
        x = x.reshape(b, self.num_heads, -1, h, w) * attn.unsqueeze(2)
        return x.reshape(b, -1, h, w)


class MaxSigmoidCSPLayerWithTwoConv(nn.Module):
    def __init__(self, c_in, c_out, n, guide_c, embed_c, num_heads):
        super().__init__()
        self.mid = c_out // 2
        self.main_conv = ConvModule(c_in, 2 * self.mid, 1)
        self.blocks = nn.ModuleList(
            DarknetBottleneck(self.mid, add_identity=False) for _ in range(n)
        )
        self.attn_block = MaxSigmoidAttnBlock(
            self.mid, self.mid, guide_c, embed_c, num_heads
        )
        self.final_conv = ConvModule((3 + n) * self.mid, c_out, 1)

    def forward(self, x, guide):
        y = self.main_conv(x)
        outs = list(y.split((self.mid, self.mid), 1))
        for b in self.blocks:
            outs.append(b(outs[-1]))
        outs.append(self.attn_block(outs[-1], guide))
        return self.final_conv(torch.cat(outs, 1))


class SPPFBottleneck(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = ConvModule(c, c // 2, 1)
        self.conv2 = ConvModule(c // 2 * 4, c, 1)

    def forward(self, x):
        h = self.conv1(x)
        pools = [h]
        for _ in range(3):
            pools.append(F.max_pool2d(pools[-1], 5, 1, 2))
        return self.conv2(torch.cat(pools, 1))


class BNContrastiveHead(nn.Module):
    def __init__(self, embed_dims):
        super().__init__()
        self.norm = nn.BatchNorm2d(embed_dims, eps=1e-3, momentum=0.03)
        self.bias = nn.Parameter(torch.zeros([]))
        self.logit_scale = nn.Parameter(-1.0 * torch.ones([]))

    def forward(self, x, w):
        x = self.norm(x)
        w = F.normalize(w, dim=-1, p=2)
        x = torch.einsum("bchw,bkc->bkhw", x, w.expand(x.shape[0], -1, -1))
        return x * self.logit_scale.exp() + self.bias


def _build_replica(cfg: YoloWorldConfig, text_model):
    """Top module whose state_dict keys are the mmyolo YOLO-World layout."""
    w, d = cfg.widths, cfg.depths

    image_model = nn.Module()
    image_model.stem = ConvModule(3, w[0], 3, 2)
    prev = w[0]
    for i, (width, depth) in enumerate(zip(w[1:], d), start=1):
        stage = [ConvModule(prev, width, 3, 2),
                 CSPLayerWithTwoConv(width, width, depth)]
        if i == 4:
            stage.append(SPPFBottleneck(width))
        setattr(image_model, f"stage{i}", nn.Sequential(*stage))
        prev = width

    backbone = nn.Module()
    backbone.image_model = image_model
    backbone.text_model = nn.Module()
    backbone.text_model.model = text_model

    e, m = cfg.neck_embed, cfg.neck_heads
    g = cfg.text_dim
    n = cfg.neck_depth
    neck = nn.Module()
    neck.top_down_layers = nn.ModuleList([
        MaxSigmoidCSPLayerWithTwoConv(w[4] + w[3], w[3], n, g, e[1], m[1]),
        MaxSigmoidCSPLayerWithTwoConv(w[3] + w[2], w[2], n, g, e[0], m[0]),
    ])
    neck.downsample_layers = nn.ModuleList([
        ConvModule(w[2], w[2], 3, 2),
        ConvModule(w[3], w[3], 3, 2),
    ])
    neck.bottom_up_layers = nn.ModuleList([
        MaxSigmoidCSPLayerWithTwoConv(w[2] + w[3], w[3], n, g, e[1], m[1]),
        MaxSigmoidCSPLayerWithTwoConv(w[3] + w[4], w[4], n, g, e[2], m[2]),
    ])

    cls_w, reg_w = cfg.cls_branch_width, cfg.reg_branch_width
    head_module = nn.Module()
    head_module.cls_preds = nn.ModuleList()
    head_module.reg_preds = nn.ModuleList()
    head_module.cls_contrasts = nn.ModuleList()
    for c_in in (w[2], w[3], w[4]):
        head_module.cls_preds.append(nn.Sequential(
            ConvModule(c_in, cls_w, 3), ConvModule(cls_w, cls_w, 3),
            nn.Conv2d(cls_w, cfg.text_dim, 1),
        ))
        head_module.reg_preds.append(nn.Sequential(
            ConvModule(c_in, reg_w, 3), ConvModule(reg_w, reg_w, 3),
            nn.Conv2d(reg_w, 4 * cfg.reg_max, 1),
        ))
        head_module.cls_contrasts.append(BNContrastiveHead(cfg.text_dim))
    bbox_head = nn.Module()
    bbox_head.head_module = head_module

    top = nn.Module()
    top.backbone = backbone
    top.neck = neck
    top.bbox_head = bbox_head
    return top


def _randomize_bn_stats(module, gen):
    """Give every BN nontrivial running stats so folding is actually tested."""
    for mod in module.modules():
        if isinstance(mod, nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * 0.3
                )
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=gen) * 2 + 0.2
                )
                mod.weight.copy_(
                    torch.randn(mod.weight.shape, generator=gen) * 0.2 + 1.0
                )
                mod.bias.copy_(torch.randn(mod.bias.shape, generator=gen) * 0.2)


def _replica_forward(top, cfg, pixels, text):
    """Reference forward (backbone -> PAFPN -> head), NCHW torch."""
    im = top.backbone.image_model
    x = im.stem(pixels)
    feats = []
    for i in range(1, 5):
        x = getattr(im, f"stage{i}")(x)
        if i >= 2:
            feats.append(x)
    p3, p4, p5 = feats

    neck = top.neck
    guide = text
    up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
    t4 = neck.top_down_layers[0](torch.cat([up(p5), p4], 1), guide)
    t3 = neck.top_down_layers[1](torch.cat([up(t4), p3], 1), guide)
    b4 = neck.bottom_up_layers[0](
        torch.cat([neck.downsample_layers[0](t3), t4], 1), guide
    )
    b5 = neck.bottom_up_layers[1](
        torch.cat([neck.downsample_layers[1](b4), p5], 1), guide
    )

    hm = top.bbox_head.head_module
    logits_all, boxes_all = [], []
    for li, (feat, stride) in enumerate(zip([t3, b4, b5], cfg.strides)):
        emb = hm.cls_preds[li](feat)
        logit = hm.cls_contrasts[li](emb, text)             # (B, T, H, W)
        dfl = hm.reg_preds[li](feat)                        # (B, 4R, H, W)
        b, _, hh, ww = dfl.shape
        dist = dfl.reshape(b, 4, cfg.reg_max, hh, ww).softmax(2)
        bins = torch.arange(cfg.reg_max, dtype=torch.float32)
        ltrb = torch.einsum("bkrhw,r->bkhw", dist, bins)
        ys, xs = torch.meshgrid(
            torch.arange(hh, dtype=torch.float32) + 0.5,
            torch.arange(ww, dtype=torch.float32) + 0.5,
            indexing="ij",
        )
        x0 = (xs - ltrb[:, 0]) * stride
        y0 = (ys - ltrb[:, 1]) * stride
        x1 = (xs + ltrb[:, 2]) * stride
        y1 = (ys + ltrb[:, 3]) * stride
        boxes = torch.stack([x0, y0, x1, y1], -1).reshape(b, -1, 4)
        logits_all.append(logit.permute(0, 2, 3, 1).reshape(b, hh * ww, -1))
        boxes_all.append(boxes)
    return torch.cat(logits_all, 1), torch.cat(boxes_all, 1)


# ---------------------------------------------------------------------------
# Configs under test
# ---------------------------------------------------------------------------

TINY = YoloWorldConfig(
    widths=(8, 16, 32, 64, 64), depths=(1, 2, 2, 1), neck_depth=1,
    neck_embed=(16, 32, 32), neck_heads=(2, 4, 4),
    text_dim=32, reg_max=8, image_size=64, num_classes=16,
)
# embed != mid on every fusion block -> exercises embed_conv
TINY_EMBED = YoloWorldConfig(
    widths=(8, 16, 32, 64, 64), depths=(1, 1, 1, 1), neck_depth=1,
    neck_embed=(8, 16, 16), neck_heads=(2, 2, 2),
    text_dim=32, reg_max=8, image_size=64, num_classes=16,
)


def _tiny_text_model(max_positions: int = 16):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    # Real CLIP's EOT token is the highest vocab id (49407); our TextTower
    # pools at argmax(input_ids), so the tiny config must keep that property.
    cfg = CLIPTextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=max_positions, projection_dim=32,
        bos_token_id=62, eos_token_id=63,
    )
    torch.manual_seed(3)
    return CLIPTextModelWithProjection(cfg).eval()


def _convert_and_compare(cfg, seed=0, atol=2e-4):
    gen = torch.Generator().manual_seed(seed)
    torch.manual_seed(seed)
    top = _build_replica(cfg, _tiny_text_model())
    top.eval()
    _randomize_bn_stats(top, gen)

    pixels = torch.rand(2, 3, cfg.image_size, cfg.image_size, generator=gen)
    text = F.normalize(
        torch.randn(1, 5, cfg.text_dim, generator=gen), dim=-1, p=2
    )
    with torch.no_grad():
        t_logits, t_boxes = _replica_forward(top, cfg, pixels, text)

    variables, text_variables = convert_mmyolo_yolo_world_state_dict(
        top.state_dict(), cfg
    )
    model = YoloWorldDetector(cfg, dtype=jnp.float32)
    j_logits, j_boxes = model.apply(
        variables,
        jnp.asarray(pixels.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(text[0].numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(j_logits), t_logits.numpy(), atol=atol, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(j_boxes), t_boxes.numpy(), atol=5e-3, rtol=1e-3
    )
    return top, variables, text_variables


class TestDetectorParity:
    def test_full_graph_parity(self):
        _convert_and_compare(TINY)

    def test_embed_conv_variant_parity(self):
        top, variables, _ = _convert_and_compare(TINY_EMBED)
        # the variant actually has embed_conv tensors
        assert any("embed_conv" in k for k in top.state_dict())
        assert "embed_conv" in variables["params"]["top_down0"]["attn_block"]


class TestTextParity:
    def test_text_tower_matches_hf_projection(self):
        from tstar_tpu.models.owlvit import TextConfig

        text_model = _tiny_text_model()
        top = _build_replica(TINY, text_model)
        _, text_variables = convert_mmyolo_yolo_world_state_dict(
            top.state_dict(), TINY
        )
        ids = torch.tensor([[1, 5, 9, 63, 0, 0], [2, 8, 63, 0, 0, 0]])
        mask = (ids > 0).long()
        with torch.no_grad():
            hf = text_model(input_ids=ids, attention_mask=mask).text_embeds
            hf = F.normalize(hf, dim=-1, p=2)
        text_cfg = TextConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_length=16,
        )
        enc = YoloTextEncoder(text_cfg, projection_dim=32, dtype=jnp.float32)
        ours = enc.apply(
            text_variables, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy())
        )
        np.testing.assert_allclose(np.asarray(ours), hf.numpy(), atol=2e-5)


class TestStructuralChecks:
    def test_leftover_tensor_raises(self):
        top = _build_replica(TINY, _tiny_text_model())
        sd = dict(top.state_dict())
        sd["neck.top_down_layers.0.attn_block.mystery.weight"] = torch.zeros(3)
        with pytest.raises(ConversionError, match="not consumed"):
            convert_mmyolo_yolo_world_state_dict(sd, TINY)

    def test_missing_tensor_raises(self):
        top = _build_replica(TINY, _tiny_text_model())
        sd = dict(top.state_dict())
        del sd["backbone.image_model.stem.conv.weight"]
        with pytest.raises(ConversionError, match="missing"):
            convert_mmyolo_yolo_world_state_dict(sd, TINY)

    def test_ignored_buffers_ok(self):
        top = _build_replica(TINY, _tiny_text_model())
        sd = dict(top.state_dict())
        sd["bbox_head.head_module.proj"] = torch.arange(8.0)
        sd["data_preprocessor.mean"] = torch.zeros(3)
        convert_mmyolo_yolo_world_state_dict(sd, TINY)  # no raise

    def test_eval_shape_validation(self):
        from tstar_tpu.models.owlvit import TextConfig

        _, variables, text_variables = _convert_and_compare(TINY)
        text_cfg = TextConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_length=16,
        )
        validate_converted_shapes(TINY, text_cfg, variables, text_variables)


class TestCheckpointDirLoading:
    def test_real_clip_position_length_validates(self):
        """Real CLIP text towers have 77 position embeddings; the inferred
        TextConfig.max_length must match the checkpoint (regression: a
        hardcoded 16 made every real-checkpoint load fail shape
        validation)."""
        from tstar_tpu.models.yolo_loader import _infer_text_config

        top = _build_replica(TINY, _tiny_text_model(max_positions=77))
        variables, text_variables = convert_mmyolo_yolo_world_state_dict(
            top.state_dict(), TINY
        )
        text_cfg = _infer_text_config(text_variables)
        assert text_cfg.max_length == 77
        validate_converted_shapes(TINY, text_cfg, variables, text_variables)

    def test_pth_plus_tokenizer_dir(self, tmp_path):
        from tstar_tpu.models.yolo_loader import load_yolo_world_checkpoint

        cfg_small_replica = TINY
        top = _build_replica(cfg_small_replica, _tiny_text_model())
        torch.save({"state_dict": top.state_dict(), "meta": {"note": "test"}},
                   tmp_path / "yolo_world_v2_test.pth")
        # minimal CLIP tokenizer files (pattern from tests/test_tokenizer.py)
        chars = list("abcdefghijklmnopqrstuvwxyz ")
        vocab = {}
        for ch in chars:
            vocab.setdefault(ch, len(vocab))
            vocab.setdefault(ch + "</w>", len(vocab))
        vocab.setdefault("<|startoftext|>", len(vocab))
        vocab.setdefault("<|endoftext|>", len(vocab))
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text("#version: 0.2\n")

        import tstar_tpu.models.yolo_loader as yl

        orig_xl = yl.load_yolo_world_checkpoint.__globals__  # noqa: F841
        # load with the tiny architecture by monkeypatching the size table
        import tstar_tpu.models.yoloworld as yw

        old = yw.yoloworld_small
        yw.yoloworld_small = lambda: cfg_small_replica
        try:
            model, variables, text_model, text_vars, tok = (
                load_yolo_world_checkpoint(str(tmp_path), size="small")
            )
        finally:
            yw.yoloworld_small = old
        # converted model runs
        logits, boxes = model.apply(
            jax.tree_util.tree_map(jnp.asarray, variables),
            jnp.zeros((1, cfg_small_replica.image_size,
                       cfg_small_replica.image_size, 3), jnp.bfloat16),
            jnp.zeros((3, cfg_small_replica.text_dim), jnp.bfloat16),
        )
        assert logits.shape[0] == 1 and boxes.shape[-1] == 4
        ids, mask = tok.encode_batch(["a couch"])
        assert ids.shape[0] == 1
