"""On-device image preprocessing for the detector path.

The reference's per-iteration pixel chain is host-side OpenCV (reference
``TStar/interface_searcher.py:362`` resize to 800x380, ``:186`` 200x95 grid
cells, ``:171-188`` hstack/vstack grid assembly) followed by the HF processor
resize to 768x768 + CLIP normalization.  Here the whole chain runs on-device
over an HBM-resident frame cache:

    cache (N, ch, cw, 3) uint8  --gather-->  (K, ch, cw, 3)
      --resize+normalize+pack-->  (1, 768, 768, 3) detector input

TPU-first formulation: bilinear resampling is expressed as two small dense
matmuls with precomputed interpolation matrices (out = A_h @ img @ A_w^T),
which XLA tiles onto the MXU — far better than gather-based resampling on
TPU.  The matrices implement cv2.resize(INTER_LINEAR) semantics (half-pixel
centers, edge clamp, no antialiasing); parity is tested against cv2 in
``tests/test_image_ops.py``.

Deviation from the reference chain (documented, recall-matched rather than
pixel-exact): cells are resized cache->cell in ONE step instead of the
reference's native->800x380->200x95->grid->768x768 chain (fewer resampling
generations, same layout).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear resampling matrix, cv2 INTER_LINEAR semantics."""
    scale = n_in / n_out
    out = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        frac = src - i0
        lo = min(max(i0, 0), n_in - 1)
        hi = min(max(i0 + 1, 0), n_in - 1)
        out[o, lo] += 1.0 - frac
        out[o, hi] += frac
    return out


def bilinear_resize(images: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Resize (..., H, W, C) images with cv2.INTER_LINEAR semantics.

    Runs as two MXU matmuls; inputs may be uint8 (promoted to the compute
    dtype) — output is float32.
    """
    h_in, w_in = images.shape[-3], images.shape[-2]
    h_out, w_out = out_hw
    ah = jnp.asarray(_interp_matrix(h_in, h_out))
    aw = jnp.asarray(_interp_matrix(w_in, w_out))
    x = images.astype(jnp.float32)
    x = jnp.einsum("oh,...hwc->...owc", ah, x)
    x = jnp.einsum("pw,...owc->...opc", aw, x)
    return x


def normalize_clip(pixels: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8/float [0,255] -> CLIP-normalized floats."""
    x = pixels.astype(jnp.float32) / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    return x.astype(dtype)


def pack_grid(cells: jax.Array, rows: int, cols: int) -> jax.Array:
    """(R*C, h, w, C) cells -> (R*h, C*w, C) grid image (row-major order,
    matching the reference hstack/vstack layout, interface_searcher.py:187)."""
    n, h, w, c = cells.shape
    assert n == rows * cols
    return (
        cells.reshape(rows, cols, h, w, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * h, cols * w, c)
    )


def build_detector_grid(
    cache: jax.Array,        # (N_pad, ch, cw, 3) uint8 frame cache
    secs: jax.Array,         # (R*C,) sampled seconds
    grid_shape: Tuple[int, int],
    detector_size: int = 768,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Gather frames and build one normalized detector input (1, S, S, 3).

    Cell k (row-major) holds the frame sampled for second ``secs[k]`` — the
    cell<->frame correspondence the score splat relies on
    (interface_searcher.py:296-306).
    """
    import os

    rows, cols = grid_shape
    cell_h, cell_w = detector_size // rows, detector_size // cols
    frames = cache[secs]                                   # (K, ch, cw, 3)
    cells = bilinear_resize(frames, (cell_h, cell_w))      # (K, h', w', 3)
    if os.environ.get("TSTAR_PREPROCESS_F32_PACK"):
        # previous order (f32 layout churn), kept for A/B measurement
        grid = pack_grid(cells, rows, cols)
        return normalize_clip(grid, dtype)[None]
    # Normalize (elementwise, commutes with packing bit-for-bit) BEFORE the
    # grid/patch layout transposes: the r3 B=16 device trace showed ~3.7 ms
    # of a 26 ms step in f32 reshape/copy chains between the resize and the
    # patch matmul — converting to the compute dtype first runs that churn
    # at half the bytes.
    cells = normalize_clip(cells, dtype)
    return pack_grid(cells, rows, cols)[None]              # (1, S, S, 3)


def build_verify_batch(
    cache: jax.Array,
    secs: jax.Array,
    detector_size: int = 768,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Gather frames for verification rescoring -> (K, S, S, 3) normalized.

    The reference re-decodes each triggered frame at 600x285 and scores it as
    a 1x1 grid (interface_searcher.py:401-404); here the cached frame is
    resized straight to the detector input size.
    """
    frames = cache[secs]
    imgs = bilinear_resize(frames, (detector_size, detector_size))
    return normalize_clip(imgs, dtype)
