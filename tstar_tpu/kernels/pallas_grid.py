"""Pallas kernel: fused frame-gather -> resize -> normalize -> grid-pack.

The detector-input builder is the hot per-iteration preprocessing op (the
XLA formulation lives in kernels/image.py).  This kernel fuses the whole
chain into one pass with no HBM intermediates:

  * grid dimension = cell index k (R*C programs);
  * the sampled second for cell k arrives by SCALAR PREFETCH, so the kernel
    DMAs exactly ``cache[secs[k]]`` from HBM into VMEM — a data-dependent
    gather with no host involvement;
  * bilinear resize runs as two MXU matmuls: a height interpolation matrix
    (cell_h x ch) and a channel-preserving width matrix (the width
    interpolation Kronecker the 3x3 identity), operating on the frame viewed
    as (ch, cw*3) so interleaved RGB needs no layout shuffle;
  * CLIP normalization folds into a per-lane scale/bias applied on the way
    to the output block, written in bf16 straight into the packed
    (R*cell_h, C*cell_w*3) grid canvas.

Numerical parity with the XLA path is tested in interpret mode
(tests/test_pallas_grid.py); select it with
``SearchConfig.use_pallas_preprocess=True``.

MEASURED (r2, v5e, honest host-fetch fences): the kernel is SLOWER than
XLA's fused gather+matmul-resize end-to-end (604 vs 678 frames/s on the
worst-case search) — preprocessing is <1% of step FLOPs, and the per-row
DMA/matmul pipeline costs ~2.5 ms/step that XLA doesn't pay.  It therefore
defaults OFF (detector_scorer.resolve_pallas_preprocess) and is kept as a
working scalar-prefetch-DMA exemplar for ops where fusion actually wins.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tstar_tpu.kernels.image import CLIP_MEAN, CLIP_STD, _interp_matrix


@functools.lru_cache(maxsize=16)
def _width_kron_matrix(w_in: int, w_out: int) -> np.ndarray:
    """(w_in*3, w_out*3) channel-preserving width-resize matrix."""
    aw = _interp_matrix(w_in, w_out)          # (w_out, w_in)
    return np.kron(aw.T, np.eye(3, dtype=np.float32))


def _norm_vectors(w_out: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-lane CLIP normalization folded with the /255 rescale."""
    scale = (1.0 / (255.0 * CLIP_STD)).astype(np.float32)
    bias = (-CLIP_MEAN / CLIP_STD).astype(np.float32)
    return (
        np.tile(scale, w_out)[None, :],   # (1, w_out*3)
        np.tile(bias, w_out)[None, :],
    )


def _make_grid_kernel(cols: int, height_identity: bool):
    def kernel(secs_ref, cache_ref, ah_ref, awk_ref, scale_ref, bias_ref,
               out_ref, frame_vmem, sem):
        # One program per grid ROW (lane-aligned output blocks); the row's
        # frames stream through double-buffered DMAs overlapped with the
        # resize matmuls of the previous cell.  With the default cache the
        # height interpolation is an exact identity and is skipped.
        r = pl.program_id(0)

        def dma_for(c, slot):
            sec = secs_ref[r * cols + c]
            return pltpu.make_async_copy(
                cache_ref.at[sec], frame_vmem.at[slot], sem.at[slot]
            )

        dma_for(0, 0).start()
        cells = []
        for c in range(cols):
            if c + 1 < cols:
                dma_for(c + 1, (c + 1) % 2).start()
            dma_for(c, c % 2).wait()
            # Mosaic has no direct uint8->f32 cast; hop through int32.
            x = frame_vmem[c % 2].astype(jnp.int32).astype(jnp.float32)
            if not height_identity:
                x = jnp.dot(ah_ref[:], x, preferred_element_type=jnp.float32)
            y = jnp.dot(x, awk_ref[:], preferred_element_type=jnp.float32)
            cells.append(y * scale_ref[:] + bias_ref[:])
        out_ref[:] = jnp.concatenate(cells, axis=-1).astype(out_ref.dtype)

    return kernel


def build_detector_grid_pallas(
    cache: jax.Array,        # (N_pad, ch, cw, 3) uint8
    secs: jax.Array,         # (R*C,) int32
    grid_shape: Tuple[int, int],
    detector_size: int = 768,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused equivalent of kernels.image.build_detector_grid -> (1, S, S, 3)."""
    rows, cols = grid_shape
    n, ch, cw, _ = cache.shape
    cell_h, cell_w = detector_size // rows, detector_size // cols
    if not interpret and (ch % 32 or (cw * 3) % 128):
        raise ValueError(
            f"pallas grid builder needs an aligned cache: height % 32 == 0 and "
            f"width*3 % 128 == 0, got {(ch, cw)}; use SearchConfig.cache_hw "
            f"defaults or the XLA path"
        )

    cache2d = cache.reshape(n, ch, cw * 3)
    ah = jnp.asarray(_interp_matrix(ch, cell_h))              # (cell_h, ch)
    awk = jnp.asarray(_width_kron_matrix(cw, cell_w))         # (cw*3, cell_w*3)
    scale_np, bias_np = _norm_vectors(cell_w)
    scale, bias = jnp.asarray(scale_np), jnp.asarray(bias_np)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                # cache stays HBM
            pl.BlockSpec((cell_h, ch), lambda r, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cw * 3, cell_w * 3), lambda r, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cell_w * 3), lambda r, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cell_w * 3), lambda r, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (cell_h, cols * cell_w * 3), lambda r, s: (r, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ch, cw * 3), jnp.uint8),   # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    height_identity = bool(
        np.allclose(_interp_matrix(ch, cell_h), np.eye(cell_h), atol=1e-6)
    ) if ch == cell_h else False
    out = pl.pallas_call(
        _make_grid_kernel(cols, height_identity),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows * cell_h, cols * cell_w * 3), dtype),
        interpret=interpret,
    )(secs.astype(jnp.int32), cache2d, ah, awk, scale, bias)
    return out.reshape(1, rows * cell_h, cols * cell_w, 3)
