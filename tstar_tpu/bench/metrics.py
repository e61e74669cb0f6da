"""Keyframe-search evaluation metrics (reference val_tstar_results.py).

Implements the reference's metric definitions:

* **Temporal P/R/F1** — a predicted timestamp matches a ground-truth
  timestamp when |Δt| <= threshold (5 s default); precision over predictions,
  recall over GT, averaged per video (val_tstar_results.py:186-214).
* **SSIM P/R/F1** — pairwise SSIM between GT and predicted frames; per video,
  precision = mean over predictions of their best SSIM against any GT frame,
  recall = mean over GT of their best SSIM against any prediction
  (:216-239).  NOTE the reference's ``ssim_torch`` (:62-78) feeds RGB frames
  as (H, W, 3) tensors into a conv2d with ``channels = H`` — i.e. the 11x11
  Gaussian window slides over the (width, color) plane with the image HEIGHT
  as the channel axis.  That unusual axis convention is reproduced exactly
  here (``axis_convention="reference"``) so metric numbers are comparable;
  ``axis_convention="standard"`` computes conventional per-channel SSIM.
* **ANND** — average nearest-neighbour distance, defined in the reference
  (:241-256) but never wired into its report; here it IS reported.

SSIM runs as a jitted ``lax.conv_general_dilated`` over the full GT x pred
pair grid at once — the reference loops pairs on the host with per-pair CUDA
convs (:90-94).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

F64 = np.float64


# ---------------------------------------------------------------------------
# Temporal metrics (pure NumPy)
# ---------------------------------------------------------------------------

def temporal_prf(
    gt_secs: Sequence[np.ndarray],
    pred_secs: Sequence[np.ndarray],
    threshold: float = 5.0,
) -> Tuple[float, float, float]:
    """Per-video P/R/F1 on |Δt| <= threshold, averaged over videos."""
    ps, rs, fs = [], [], []
    for gt, pred in zip(gt_secs, pred_secs):
        gt = np.asarray(gt, F64)
        pred = np.asarray(pred, F64)
        if gt.size == 0 or pred.size == 0:
            continue
        d_gt = np.min(np.abs(gt[:, None] - pred[None, :]), axis=1)
        d_pred = np.min(np.abs(pred[:, None] - gt[None, :]), axis=1)
        p = float(np.sum(d_pred <= threshold)) / len(pred)
        r = float(np.sum(d_gt <= threshold)) / len(gt)
        f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
        ps.append(p)
        rs.append(r)
        fs.append(f)
    if not ps:
        return 0.0, 0.0, 0.0
    return float(np.mean(ps)), float(np.mean(rs)), float(np.mean(fs))


def annd(
    gt_secs: Sequence[np.ndarray], pred_secs: Sequence[np.ndarray]
) -> Tuple[float, float]:
    """Average nearest-neighbour distance (precision-side, recall-side)."""
    pres, recs = [], []
    for gt, pred in zip(gt_secs, pred_secs):
        gt = np.asarray(gt, F64)
        pred = np.asarray(pred, F64)
        if gt.size == 0 or pred.size == 0:
            continue
        pres.append(float(np.mean(np.min(np.abs(pred[:, None] - gt[None, :]), axis=1))))
        recs.append(float(np.mean(np.min(np.abs(gt[:, None] - pred[None, :]), axis=1))))
    if not pres:
        return 0.0, 0.0
    return float(np.mean(pres)), float(np.mean(recs))


# ---------------------------------------------------------------------------
# SSIM (jitted; reference axis convention reproduced)
# ---------------------------------------------------------------------------

def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


@functools.lru_cache(maxsize=8)
def _ssim_pairwise_fn(shape: Tuple[int, int, int], convention: str):
    """Build a jitted pairwise-SSIM over (G, h, w, c) x (P, h, w, c)."""
    import jax
    import jax.numpy as jnp

    h, w, c = shape
    win = _gaussian_window()
    c1, c2 = 0.01 ** 2, 0.03 ** 2

    if convention == "reference":
        # channels = image height; spatial = (width, color): the reference's
        # ssim_torch axis layout (val_tstar_results.py:62-78).
        channels, spatial = h, (w, c)
        def to_conv_layout(img):  # (h, w, c) -> (1, channels, *spatial)
            return img[None]
    elif convention == "standard":
        channels, spatial = c, (h, w)
        def to_conv_layout(img):
            return jnp.moveaxis(img, -1, 0)[None]
    else:
        raise ValueError(convention)

    kernel = jnp.asarray(
        np.broadcast_to(win, (channels, 1, 11, 11)).copy()
    )

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=[(5, 5), (5, 5)],
            feature_group_count=channels,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    def ssim_one(a, b):
        x, y = to_conv_layout(a), to_conv_layout(b)
        mu_x, mu_y = conv(x), conv(y)
        sxx = conv(x * x) - mu_x * mu_x
        syy = conv(y * y) - mu_y * mu_y
        sxy = conv(x * y) - mu_x * mu_y
        m = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
            (mu_x * mu_x + mu_y * mu_y + c1) * (sxx + syy + c2)
        )
        return jnp.mean(m)

    @jax.jit
    def run(gt, pred):
        gt = gt.astype(jnp.float32) / 255.0
        pred = pred.astype(jnp.float32) / 255.0
        return jax.vmap(lambda a: jax.vmap(lambda b: ssim_one(a, b))(pred))(gt)

    return run


def pairwise_ssim(
    gt_frames: Sequence[np.ndarray],
    pred_frames: Sequence[np.ndarray],
    axis_convention: str = "reference",
) -> np.ndarray:
    """(num_gt, num_pred) SSIM matrix; frames are uint8 RGB of equal shape."""
    gt = np.stack([np.asarray(f) for f in gt_frames])
    pred = np.stack([np.asarray(f) for f in pred_frames])
    if gt.shape[1:] != pred.shape[1:]:
        raise ValueError(f"frame shapes differ: {gt.shape[1:]} vs {pred.shape[1:]}")
    fn = _ssim_pairwise_fn(tuple(gt.shape[1:]), axis_convention)
    return np.asarray(fn(gt, pred))


def ssim_prf(
    gt_images: Sequence[Sequence[np.ndarray]],
    pred_images: Sequence[Sequence[np.ndarray]],
    axis_convention: str = "reference",
) -> Tuple[float, float, float]:
    """Averaged SSIM precision/recall, F1 of the averages (:356-367)."""
    ps, rs = [], []
    for gt, pred in zip(gt_images, pred_images):
        gt = [g for g in gt if np.asarray(g).size > 0]
        pred = [p for p in pred if np.asarray(p).size > 0]
        if not gt or not pred:
            continue
        m = pairwise_ssim(gt, pred, axis_convention)
        ps.append(float(np.mean(np.max(m, axis=0))))
        rs.append(float(np.mean(np.max(m, axis=1))))
    if not ps:
        return 0.0, 0.0, 0.0
    p, r = float(np.mean(ps)), float(np.mean(rs))
    f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return p, r, f


# ---------------------------------------------------------------------------
# QA answer matching (val_qa_results.py:134-151)
# ---------------------------------------------------------------------------

def match_answer(predicted: str, ground_truth: str) -> bool:
    import re

    m = re.match(r"^\s*([A-Fa-f])", predicted)
    if m:
        return m.group(1).lower() == ground_truth.strip().lower()
    return predicted.strip().lower() == ground_truth.strip().lower()
