"""Fused cache->grid->patch-embedding path (``TSTAR_GRID_EMBED``).

The last batch-growing HBM term in the sparse-regime step (r3 post-MHA
trace, PERFORMANCE.md): ~2.2 ms/step at B=16 of "preprocess churn" — the
gather from the uint8 frame cache, the bilinear-resize einsums, the
normalize cast, the grid-pack transposes, the (B, S, S, 3) bf16 pixel
canvas they materialize, and the pad-to-4-channels copy the patch kernel's
operand needs.  ONE Pallas pass deletes the whole chain: frames gather by
a cheap XLA dynamic-slice (~56 MB uint8 at B=16); each program then
consumes its grid cell-row's frames as a GRIDDED, auto-pipelined uint8
block, runs the bilinear resize as MXU dots against a channel-interleaved
width matrix with the CLIP /255+normalize affine FOLDED IN (zero-padded
4th channel), assembles the cell row in the 128-lane padded canvas layout
IN VMEM, and immediately consumes it with the patchify->embed h-loop of
``kernels/patch_matmul.py`` — the pixel canvas never exists in HBM.  The
only HBM traffic left is cache-bytes in and embedding-bytes out.

Three designs died on the way here, each recorded in docstrings below: a
composed cache->embedding weight fell to Mosaic's DMA tiling rule — any
>=2-d slice's last two dims must align to (8, 128), which the per-cell
patch split (npw=6, s_w*3=192) cannot; in-kernel scalar-prefetch frame
DMAs measured 3x slower end-to-end than the gridded operand; and a
two-stage canvas-kernel -> patch-kernel pipeline measured dead-equal with
the pixel chain (15.4k f/s both, B=16 sparse) — the ~148 MB/step canvas
HBM round-trip it kept was exactly the margin.  Separately, reshaping the
CACHE to (B, N, ch, cw*3) before the gather made XLA relayout the entire
~3.6 GB cache every step (~32 ms/step, the first designs' "3x slowdown"):
the gather must run on the cache's natural 5-d shape.

Unlike the measured-negative XLA-space composed projection
(``kernels/image.composed_patch_projection``, -7%: its gathered patchify
operand defeats XLA's fusions) this needs NO block-aligned resize
geometry: any cache->cell bilinear resize expresses as the two matrices.
XLA-equivalence is pinned in tests/test_grid_embed.py; the e2e A/B
harness is scripts/ab_grid_embed.py.

MEASURED VERDICT (r4, interleaved in-process, sparse regime): e2e
NEUTRAL-to-slightly-negative — B=8 14,883 vs 15,077 f/s (-1.1%), B=16
15,528 vs 15,452 (+0.5%, within noise), B=24 15,778 vs 15,823 (-0.3%).
Deleting the canvas round-trip AND the churn fusions moved nothing:
at these batches the whole preprocess stream (which IS batch-growing
HBM traffic) is overlapped behind the detector's MXU-bound encoder
forwards, so it never sits on the critical path.  This sharpens the
repo's critical-path rule one more notch: batch-growing bytes are only
a lever when the schedule is bandwidth-saturated at the moment they
move — at 15k f/s the sparse step is MXU-bound and has slack bandwidth.
OPT-IN via ``TSTAR_GRID_EMBED=1`` (default off); kept because the
machinery is exact, dp-partitionable, and the win may exist at larger
canvases (e.g. OWLv2 1008px, where preprocess bytes grow ~1.7x while
encoder FLOPs grow with patch count).

Reference mapping: replaces the reference's per-iteration OpenCV grid
assembly + HF processor resize/normalize + conv patch embedding
(``TStar/interface_searcher.py:171-188``, ``interface_heuristic.py:200-210``)
for the batched TPU path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from tstar_tpu.kernels.attention import _FUSED_MHA_DISABLED, _MESH_KERNEL_INFO
from tstar_tpu.kernels.image import CLIP_MEAN, CLIP_STD, _interp_matrix


# ---------------------------------------------------------------------------
# Resize/normalize matrices (host-side, cached per geometry)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _width_affine(cw: int, cell_w: int, c_pad: int):
    """Channel-interleaved width-resize matrix with the CLIP normalization
    folded in, channel-padded to ``c_pad`` lanes per pixel.

    Returns (awk (cw*3, cell_w*c_pad) f32, bias (cell_w*c_pad,) f32):
    ``uint8_row @ awk + bias`` = normalized resized row with zero pad
    channels, matching normalize_clip(bilinear_resize(...)) exactly.
    """
    aw = _interp_matrix(cw, cell_w)                       # (cell_w, cw)
    scale = (1.0 / (255.0 * CLIP_STD)).astype(np.float32)  # (3,)
    kron = np.zeros((cw * 3, cell_w * c_pad), np.float32)
    for c in range(3):
        kron[c::3, c::c_pad] = aw.T * scale[c]
    bias = np.zeros((cell_w * c_pad,), np.float32)
    for c in range(3):
        bias[c::c_pad] = (-CLIP_MEAN[c] / CLIP_STD[c])
    return kron, bias


@functools.lru_cache(maxsize=16)
def _height_matrix(ch: int, cell_h: int) -> Optional[np.ndarray]:
    """(cell_h, ch) height interpolation, or None when it is the identity."""
    ah = _interp_matrix(ch, cell_h)
    if ch == cell_h and np.allclose(ah, np.eye(ch), atol=1e-6):
        return None
    return ah


# ---------------------------------------------------------------------------
# Stage 1: fused gather -> resize -> normalize -> packed padded canvas
# ---------------------------------------------------------------------------


def _embed_kernel(
    frames_ref, awk_ref, bias_ref, ah_ref, wp_ref, o_ref,
    *, cols: int, lanes_per_cell: int, height_identity: bool, p: int,
):
    # frames block (1, cols, ch, cw*3) uint8 — a GRIDDED input, so Mosaic
    # double-buffers the fetch behind the previous program's compute.  (A
    # first attempt DMA'd frames out of the HBM cache by scalar-prefetch
    # index inside the kernel, pallas_grid-style, and measured 3x SLOWER
    # end-to-end — 5.3k vs 15.5k f/s at B=16 sparse: manual per-cell
    # make_async_copy chains serialize against compute instead of riding
    # the pipeline, the same ~150 us/cell loss pallas_grid recorded in r2.
    # The XLA-side gather this form needs instead is a cheap ~56 MB uint8
    # dynamic-slice.)
    cells = []
    for c in range(cols):
        # Mosaic has no direct uint8->float cast; hop through int32.  uint8
        # values are exact in bf16 (8 significand bits).
        x = frames_ref[0, c].astype(jnp.int32).astype(jnp.bfloat16)
        if not height_identity:
            x = jax.lax.dot_general(
                ah_ref[...], x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            x, awk_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[0][None, :]
        # bf16 here mirrors the two-stage form's bf16 canvas (and the
        # production pixel chain's bf16 pixels), keeping numerics identical.
        cells.append(y.astype(jnp.bfloat16))
    row = jnp.concatenate(cells, axis=-1)     # (cell_h, cols*cell_w*c_pad)
    # Patchify + patch-embed IN the same program (kernels/patch_matmul.py's
    # h-loop on the VMEM-resident canvas row): the canvas never round-trips
    # HBM (a two-stage canvas-kernel -> patch-kernel pipeline measured
    # dead-equal with the pixel chain at B=16; the ~148 MB/step canvas
    # write+read was exactly the remaining term).
    cell_h = row.shape[0]
    lanes_row = cols * lanes_per_cell
    nph, npw = cell_h // p, lanes_row // 128
    d = wp_ref.shape[-1]
    x4 = row.reshape(nph, p, npw, 128)
    acc = jnp.zeros((nph * npw, d), jnp.float32)
    for h in range(p):
        a = x4[:, h].reshape(nph * npw, 128)  # lane-preserving collapse
        acc = acc + jax.lax.dot_general(
            a, wp_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc.astype(o_ref.dtype)


def _grid_embed_pallas(
    frames_g, awk, bias2, ah, wp,
    rows: int, cols: int, cell_h: int, p: int, interpret: bool,
):
    b, rc, ch, cw3 = frames_g.shape
    lanes_per_cell = awk.shape[-1]            # cell_w * c_pad
    lanes_row = cols * lanes_per_cell
    nph, npw = cell_h // p, lanes_row // 128  # patches per grid cell-row
    d = wp.shape[-1]
    height_identity = ah is None
    ah_arg = (
        jnp.zeros((1, ch), jnp.bfloat16) if height_identity else ah
    )
    kernel = functools.partial(
        _embed_kernel,
        cols=cols, lanes_per_cell=lanes_per_cell,
        height_identity=height_identity, p=p,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, rows),
        in_specs=[
            pl.BlockSpec((1, cols, ch, cw3), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((cw3, lanes_per_cell), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, lanes_per_cell), lambda bi, ri: (0, 0)),
            pl.BlockSpec(ah_arg.shape, lambda bi, ri: (0, 0)),
            pl.BlockSpec((p, 128, d), lambda bi, ri: (0, 0, 0)),  # resident
        ],
        out_specs=pl.BlockSpec(
            (1, nph * npw, d), lambda bi, ri: (bi, ri, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows * nph * npw, d), jnp.bfloat16),
        interpret=interpret,
    )(frames_g, awk, bias2, ah_arg, wp)


# Batch-axis custom_partitioning (dp meshes), mirroring patch_matmul's:
# shard videos over the data axis, replicate the small resize matrices and
# the patch-embedding weight.
def _cp_batch_spec(arg_shapes, ndim):
    from jax.sharding import PartitionSpec as P

    spec = arg_shapes[0].sharding.spec        # frames_g (B, RC, ch, cw3)
    batch = spec[0] if len(spec) >= 1 else None
    return P(batch, *([None] * (ndim - 1)))


def _cp_infer(rows, cols, cell_h, p, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, _cp_batch_spec(arg_shapes, 3))


def _cp_partition(
    rows, cols, cell_h, p, interpret, mesh, arg_shapes, result_shape
):
    from jax.sharding import NamedSharding, PartitionSpec as P

    frames4 = NamedSharding(mesh, _cp_batch_spec(arg_shapes, 4))
    out3 = NamedSharding(mesh, _cp_batch_spec(arg_shapes, 3))
    rep2 = NamedSharding(mesh, P(None, None))
    rep3 = NamedSharding(mesh, P(None, None, None))

    def lower(fg, awk, bias2, ah_arg, wp):
        return _grid_embed_pallas(
            fg, awk, bias2,
            None if ah_arg.shape[0] == 1 else ah_arg, wp,
            rows, cols, cell_h, p, interpret,
        )

    return mesh, lower, out3, (frames4, rep2, rep2, rep2, rep3)


from jax.experimental.custom_partitioning import custom_partitioning

_embed_cp = custom_partitioning(
    lambda frames_g, awk, bias2, ah_arg, wp, rows, cols, cell_h, p, interpret: (
        _grid_embed_pallas(
            frames_g, awk, bias2,
            None if ah_arg.shape[0] == 1 else ah_arg, wp,
            rows, cols, cell_h, p, interpret,
        )
    ),
    static_argnums=(5, 6, 7, 8, 9),
)
_embed_cp.def_partition(
    infer_sharding_from_operands=_cp_infer,
    partition=_cp_partition,
    sharding_rule="b n c w, k l, o e, q r, p2 l2 d -> b z d",
    need_replication_factors=(
        "n", "c", "w", "k", "l", "o", "e", "q", "r", "p2", "l2", "d", "z",
    ),
)


# ---------------------------------------------------------------------------
# Public entry: cache -> patch embeddings
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "cell_hw", "patch_size", "interpret"),
)
def grid_cell_embed(
    cache: jax.Array,          # (B, N_pad, ch, cw, 3) uint8 frame caches
    secs: jax.Array,           # (B, R*C) sampled seconds (frame indices)
    awk: jax.Array,            # (cw*3, cell_w*c_pad) folded width+normalize
    bias: jax.Array,           # (cell_w*c_pad,) folded normalize bias
    ah: Optional[jax.Array],   # (cell_h, ch) height matrix, or None
    patch_kernel: jax.Array,   # (p, p, 3, D) HWIO patch-embedding weights
    *,
    grid_shape: Tuple[int, int],
    cell_hw: Tuple[int, int],
    patch_size: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused cache -> detector patch embeddings, (B, P, D) bf16.

    Equivalent (up to float reassociation / bf16 resize weights) to
    ``PatchEmbed(build_detector_grid(cache[b], secs[b], ...))`` per video —
    parity pinned in tests/test_grid_embed.py.  ONE Pallas pass: resize/
    normalize MXU dots build each grid cell-row in VMEM and the patchify->
    embed h-loop (kernels/patch_matmul.py's form) consumes it in place, so
    the pixel canvas never exists in HBM at all.
    """
    b, n, ch, cw, c3 = cache.shape
    rows, cols = grid_shape
    cell_h, cell_w = cell_hw
    p = patch_size
    c_pad = 128 // p
    d = patch_kernel.shape[-1]
    # Cheap XLA-side gather (~56 MB uint8 dynamic-slice at B=16) — feeding
    # the canvas kernel a gridded, auto-pipelined operand measured 3x
    # faster than gathering by in-kernel DMA (see _canvas_kernel).  The
    # gather MUST run on the cache's natural 5-d shape: reshaping the cache
    # to (B, N, ch, cw*3) first made XLA relayout the ENTIRE cache — two
    # u8[16,1024,192,...] copies, ~32 ms/step at B=16, the whole 3x
    # slowdown of the first two kernel designs (trace 2026-08-19).  Only
    # the gathered slice is flattened, a ~56 MB fused reshape.
    frames = jax.vmap(lambda c, s: c[s])(cache, secs)     # (B, RC, ch, cw, 3)
    frames_g = frames.reshape(b, rows * cols, ch, cw * c3)
    # The identity-height case rides a (1, ch) dummy operand so the
    # custom_partitioning signature stays fixed; _canvas_cp's lower fn maps
    # it back to None (static skip inside the kernel).
    ah_arg = (
        jnp.zeros((1, ch), jnp.bfloat16) if ah is None
        else ah.astype(jnp.bfloat16)
    )
    wp = jnp.pad(
        patch_kernel.astype(jnp.bfloat16),
        ((0, 0),) * 2 + ((0, c_pad - c3), (0, 0)),
    ).reshape(p, 128, d)
    return _embed_cp(
        frames_g,
        awk.astype(jnp.bfloat16),
        bias.reshape(1, -1).astype(jnp.float32),
        ah_arg, wp,
        rows, cols, cell_h, p, interpret,
    )


def grid_embed_interpret() -> bool:
    """True when TSTAR_GRID_EMBED=interpret (hermetic CPU testing)."""
    return os.environ.get("TSTAR_GRID_EMBED", "0") == "interpret"


_MIN_BATCH = 8      # same measured crossover family as the fused MHA


def use_grid_embed_kernel(
    cache_shape: Tuple[int, ...],
    image_size: int,
    patch_size: int,
    d: int,
    config,
) -> bool:
    """Gate for the fused cache->embedding path (batched grid scoring).

    ``TSTAR_GRID_EMBED``: OPT-IN — unset/"0" disables (the r4 A/B measured
    the kernel e2e neutral, module docstring), "1" enables at per-shard
    image batch >= 8, "force" bypasses the batch gate, "interpret" forces
    the kernel in interpret mode (CPU tests).  Needs
    TPU, the pallas_grid DMA alignment (cache height % 32, width*3 % 128),
    patch-kernel-compatible dims (128 % p == 0, 3 <= 128/p channels,
    cell_w*c_pad % 128 == 0, D % 128 == 0, VMEM-resident padded weight),
    and per-shard image batch >= the measured crossover.
    """
    env = os.environ.get("TSTAR_GRID_EMBED", "0")
    if env == "0":
        return False
    if _FUSED_MHA_DISABLED.get():
        return False                    # explicit kernel-suite kill switch
    if len(cache_shape) != 5:
        return False
    b, n, ch, cw, c3 = cache_shape
    rows, cols = config.grid_rows, config.grid_cols
    if image_size % rows or image_size % cols:
        return False
    cell_h, cell_w = image_size // rows, image_size // cols
    p = patch_size
    if 128 % p or c3 > 128 // p:
        return False
    if cell_h % p or cell_w % p:
        return False
    if env == "interpret":
        return True
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # noqa: BLE001 — backend not initialized yet
        return False
    c_pad = 128 // p
    if ch % 32 or (cw * c3) % 128 or (cell_w * c_pad) % 128 or d % 128:
        return False
    if p * 128 * d * 2 > 7 * 1024 * 1024:   # patch weight stays VMEM-resident
        return False
    # One program's VMEM: gridded frame block (x2 double-buffer), the
    # resident width matrix + patch weight, the in-VMEM canvas row (+concat
    # temp), and the f32 patch accumulator.
    lanes_row = cols * cell_w * c_pad
    nph, npw = cell_h // p, lanes_row // 128
    vmem = (
        2 * (cols * ch * cw * c3)                   # uint8 frames block x2
        + cw * c3 * cell_w * c_pad * 2              # awk (resident)
        + p * 128 * d * 2                           # patch weight (resident)
        + 2 * (cell_h * lanes_row * 2)              # canvas row + concat temp
        + nph * npw * d * 4                         # f32 accumulator
        + 2 * (nph * npw * d * 2)                   # out block x2
    )
    if vmem > 15 * 1024 * 1024:
        return False
    info = _MESH_KERNEL_INFO.get()
    b_local = b // info.dp if info.dp > 1 and b % info.dp == 0 else b
    return env == "force" or b_local >= _MIN_BATCH
