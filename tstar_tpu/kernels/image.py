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
    return build_detector_grid_frames(
        cache[secs], grid_shape, detector_size, dtype
    )


def build_detector_grid_frames(
    frames: jax.Array,       # (K, ch, cw, 3) uint8 already-gathered frames
    grid_shape: Tuple[int, int],
    detector_size: int = 768,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """``build_detector_grid`` after the cache gather — the streaming-cache
    path (video/cache.py StreamingFrameCache) supplies the K frames directly
    (host seek-decode), so the two paths are pixel-identical by
    construction."""
    import os

    rows, cols = grid_shape
    cell_h, cell_w = detector_size // rows, detector_size // cols
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


def composed_patch_projection(
    patch_kernel: np.ndarray,   # (p, p, 3, D) HWIO patch-embedding weights
    cache_hw: Tuple[int, int],  # frame-cache (h, w)
    cell_hw: Tuple[int, int],   # grid-cell (h, w) on the detector canvas
    patch_size: int,
):
    """Fold resize + CLIP-normalize + grid-pack + patch-embed into ONE matmul.

    The whole pixel chain feeding the detector is linear in the uint8 cache
    frame: bilinear resize is ``A_h @ F @ A_w^T`` (two fixed matrices),
    normalization is affine, grid packing is a permutation, and the patch
    embedding is a matmul.  When every detector patch's bilinear source
    support falls inside a fixed, translation-invariant source block (true
    for the default 192x384 cache -> 192x192 cell: rows are identity,
    columns are an exact 2:1 average), the composition collapses to

        embeddings = patchify(frames, (s_h, s_w)) @ W + b

    straight from the uint8 cache — no resized image, no normalized image,
    no packed grid, no f32 layout churn is ever materialized (the r3 B=16
    device trace bills that churn at ~1.7 ms of a ~24 ms sparse step).

    MEASURED e2e NEGATIVE at the default geometry (r3,
    scripts/ab_composed.py): B=16 sparse 13,087 vs 14,107 f/s for the
    pixel chain — the gathered patchify operand defeats XLA's
    gather->patch-matmul fusion and costs more than the churn it removes.
    The search path therefore treats this as OPT-IN
    (TSTAR_COMPOSED_PATCH=1, search/detector_scorer.py _grid_projection);
    the algebra stays parity-pinned in tests/test_image_ops.py.

    Returns ``(W (s_h*s_w*3, D) f32, b (D,) f32, (s_h, s_w))``, or ``None``
    when the cache/cell geometry is not block-aligned (callers fall back to
    the generic ``build_detector_grid`` chain).
    """
    ch, cw = cache_hw
    cell_h, cell_w = cell_hw
    p = patch_size
    if cell_h % p or cell_w % p:
        return None
    if (ch * p) % cell_h or (cw * p) % cell_w:
        return None
    s_h, s_w = ch * p // cell_h, cw * p // cell_w

    def block_matrix(n_in: int, n_out: int, blk_out: int, blk_in: int):
        """(blk_out, blk_in) per-block resampling matrix, or None if the
        resample is not block-aligned translation-invariant."""
        a = _interp_matrix(n_in, n_out)
        blocks = []
        for bi in range(n_out // blk_out):
            sub = a[bi * blk_out:(bi + 1) * blk_out]
            # support must stay inside this block's source columns
            outside = np.concatenate(
                [sub[:, : bi * blk_in], sub[:, (bi + 1) * blk_in:]], axis=1
            )
            if outside.size and np.abs(outside).max() > 0:
                return None
            blocks.append(sub[:, bi * blk_in:(bi + 1) * blk_in])
        first = blocks[0]
        for other in blocks[1:]:
            if not np.array_equal(first, other):
                return None
        return first

    ah = block_matrix(ch, cell_h, p, s_h)
    aw = block_matrix(cw, cell_w, p, s_w)
    if ah is None or aw is None:
        return None

    k = np.asarray(patch_kernel, np.float32)          # (p, p, 3, D)
    d = k.shape[-1]
    # W[u, v, c, :] = sum_{i,j} ah[i, u] * aw[j, v] * k[i, j, c, :] / (255*std_c)
    w = np.einsum("iu,jv,ijcd->uvcd", ah, aw, k, optimize=True)
    w = w / (255.0 * CLIP_STD.reshape(1, 1, 3, 1))
    # rows of ah/aw sum to 1, so the affine shift contributes a constant:
    # b[:] = -sum_{i,j,c} k[i,j,c,:] * mean_c / std_c
    b = -np.einsum("ijcd,c->d", k, (CLIP_MEAN / CLIP_STD).astype(np.float32))
    return (
        w.reshape(s_h * s_w * 3, d).astype(np.float32),
        b.astype(np.float32),
        (s_h, s_w),
    )


def patchify_rect(frames: jax.Array, s_h: int, s_w: int) -> jax.Array:
    """(K, H, W, C) -> (K, (H//s_h)*(W//s_w), s_h*s_w*C), (sh, sw, c) minor
    order (matching an HWIO kernel flattened to (s_h*s_w*C, D))."""
    k, h, w, c = frames.shape
    x = frames.reshape(k, h // s_h, s_h, w // s_w, s_w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(k, (h // s_h) * (w // s_w), s_h * s_w * c)


def grid_patch_embeddings(
    cache: jax.Array,          # (N_pad, ch, cw, 3) uint8 frame cache
    secs: jax.Array,           # (R*C,) sampled seconds
    proj_w: jax.Array,         # (s_h*s_w*3, D) composed projection
    proj_b: jax.Array,         # (D,)
    grid_shape: Tuple[int, int],
    src_patch_hw: Tuple[int, int],
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Composed cache -> detector patch-embedding path: (1, P, D).

    Bit-for-bit equivalent (up to float reassociation) to
    ``PatchEmbed(build_detector_grid(cache, secs, ...))`` — equivalence is
    pinned in tests/test_image_ops.py.  Patch order is the grid canvas's
    row-major patch order the position embeddings / box bias expect.
    """
    rows, cols = grid_shape
    s_h, s_w = src_patch_hw
    frames = cache[secs]                                  # (K, ch, cw, 3)
    patches = patchify_rect(frames.astype(dtype), s_h, s_w)
    e = jnp.einsum(
        "kpc,cd->kpd", patches, proj_w.astype(dtype)
    ) + proj_b.astype(dtype)                              # (K, pc, D)
    pc = e.shape[1]
    nph = frames.shape[1] // s_h                          # patches per cell (h)
    npw = pc // nph
    d = e.shape[-1]
    # cell (r, c), cell-patch (i, j) -> canvas patch (r*nph + i, c*npw + j)
    e = e.reshape(rows, cols, nph, npw, d)
    e = e.transpose(0, 2, 1, 3, 4).reshape(1, rows * nph * cols * npw, d)
    return e


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
