"""Fused patchify -> patch-embedding matmul Pallas kernel.

Target (r3 post-MHA B=16 device trace, PERFORMANCE.md): XLA lowers
``patchify(pixels) @ W`` through a chain of HBM layout copies —
(B,24,32,24,32,3) transpose copy ~0.85 ms/step, two reshapes ~0.85 ms,
plus the matmul's own operand staging — ~2 ms of a ~17.7 ms step at B=16,
all proportional to the image batch.  Under the sharpened critical-path
rule (HBM traffic that GROWS with batch is a valid target; VPU work and
fixed-size staging are not) this chain qualifies: the kernel reads each
patch-row slab of the image ONCE and never materializes a patchified
intermediate.  Channels pad to 4 so an in-patch pixel row is exactly 128
lanes, and the patchify transpose disappears into INDEXING — a static
loop over the p in-patch rows accumulates MXU dots of
((rows*npw), 128) @ (128, D) per weight slice, with the (p, 128, D)
kernel VMEM-resident (Mosaic rejects the direct (p, npw, p*C) shape
cast, so the loop form is also the only expressible one).

Math is identical to ``models/owlvit.patchify`` + the PatchEmbed einsum
(parity pinned in tests/test_patch_matmul.py).  Reference mapping: the
reference's HF conv patch embedding (`transformers` OwlViT, used via
`TStar/interface_heuristic.py:200-210`).

Sharding: batch-axis custom_partitioning like kernels/attention.py.  The
patch-embed weight replicates under tensor parallelism
(parallel/shardings.py keeps patch convs unsharded), so unlike the fused
MHA this kernel has no tp layout concern — only the per-shard batch gate
(``mesh_kernel_info``) and the explicit ``fused_mha_disabled`` kill switch
apply.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning

from tstar_tpu.kernels.attention import _FUSED_MHA_DISABLED, _MESH_KERNEL_INFO


def _patch_kernel(x_ref, w_ref, o_ref, *, p: int, rows: int, d: int):
    # x block: (1, rows*p, npw, 128) — channels padded to 4 so one patch
    # row is EXACTLY 128 lanes; the patchify "transpose" happens implicitly
    # by indexing the in-patch row h, so no Mosaic relayout is needed (the
    # first attempt's (p, npw, 96) shape cast was unsupported).  The
    # operand stays 4-d — a pure minor-split view of (B, H, W*C) that XLA
    # passes in WITHOUT a layout copy (the first 5-d operand form made XLA
    # materialize a permuted reshape + copy, ~0.95 ms/step at B=16).  The
    # h-loop accumulates p MXU dots of ((rows*npw), 128) @ (128, D) in f32.
    npw = x_ref.shape[2]
    x = x_ref[0].reshape(rows, p, npw, 128)   # major-dim split: layout-free
    acc = jnp.zeros((rows * npw, d), jnp.float32)
    for h in range(p):
        a = x[:, h].reshape(rows * npw, 128)  # lane-preserving collapse
        acc = acc + jax.lax.dot_general(
            a, w_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc.astype(o_ref.dtype)


# patch-row blocks per program: bounds VMEM (x block + f32 accumulator)
# while keeping the dot's M dimension MXU-friendly (rows*npw >= 192).
_ROW_BLOCK = 8


def _patch_pallas(x4d, w3d, p: int, interpret: bool):
    b, hh, npw, lanes = x4d.shape
    nph = hh // p
    d = w3d.shape[-1]
    rows = min(_ROW_BLOCK, nph)
    assert nph % rows == 0, (nph, rows)
    return pl.pallas_call(
        functools.partial(_patch_kernel, p=p, rows=rows, d=d),
        grid=(b, nph // rows),
        in_specs=[
            pl.BlockSpec((1, rows * p, npw, lanes), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((p, lanes, d), lambda bi, hi: (0, 0, 0)),  # resident
        ],
        out_specs=pl.BlockSpec(
            (1, rows * npw, d), lambda bi, hi: (bi, hi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, nph * npw, d), x4d.dtype),
        interpret=interpret,
    )(x4d, w3d)


def _cp_batch_spec(arg_shapes, ndim):
    from jax.sharding import PartitionSpec as P

    spec = arg_shapes[0].sharding.spec
    batch = spec[0] if len(spec) >= 1 else None
    return P(batch, *([None] * (ndim - 1)))


def _cp_infer(p, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, _cp_batch_spec(arg_shapes, 3))


def _cp_partition(p, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch4 = NamedSharding(mesh, _cp_batch_spec(arg_shapes, 4))
    out3 = NamedSharding(mesh, _cp_batch_spec(arg_shapes, 3))
    rep = NamedSharding(mesh, P(None, None, None))

    def lower(x4d, w3d):
        return _patch_pallas(x4d, w3d, p, interpret)

    return mesh, lower, out3, (batch4, rep)


_patch_cp = custom_partitioning(
    lambda x4d, w3d, p, interpret: _patch_pallas(x4d, w3d, p, interpret),
    static_argnums=(2, 3),
)
_patch_cp.def_partition(
    infer_sharding_from_operands=_cp_infer,
    partition=_cp_partition,
    # factor order follows first appearance: b, h, w1, l, p2, l2, d, q
    sharding_rule="b h w1 l, p2 l2 d -> b q d",
    need_replication_factors=("h", "w1", "l", "p2", "l2", "d", "q"),
)


@functools.partial(jax.jit, static_argnames=("interpret",))
def patch_embed_matmul(
    pixels: jax.Array,        # (B, H, W, C) compute dtype
    kernel: jax.Array,        # (p, p, C, D) HWIO, compute dtype
    *,
    interpret: bool = False,
) -> jax.Array:
    """``patchify(pixels) @ kernel.reshape(-1, D)`` in one Pallas pass.

    Channels are zero-padded to ``128 // p`` (C=3 -> 4 at p=32) so one
    in-patch pixel row spans exactly 128 lanes; the matching kernel rows
    are zero so the math is unchanged.
    """
    b, h, w, c = pixels.shape
    p = kernel.shape[0]
    d = kernel.shape[-1]
    c_pad = 128 // p
    if c < c_pad:
        pixels = jnp.pad(pixels, ((0, 0),) * 3 + ((0, c_pad - c),))
        kernel = jnp.pad(kernel, ((0, 0),) * 2 + ((0, c_pad - c), (0, 0)))
    x4d = pixels.reshape(b, h, (w * c_pad) // 128, 128)
    return _patch_cp(x4d, kernel.reshape(p, 128, d), p, interpret)


_MIN_BATCH = 8      # same measured crossover family as the fused MHA


def use_patch_embed_kernel(pixels: jax.Array, patch_size: int, d: int) -> bool:
    """Gate for routing PatchEmbed through the fused kernel.

    ``TSTAR_PATCH_KERNEL``: "0" disables, "force" bypasses the batch gate.
    Requires TPU, 4-d bf16 pixels, patch-aligned H/W, 128-lane-tileable
    row/feature dims, and a VMEM-resident weight.
    """
    env = os.environ.get("TSTAR_PATCH_KERNEL", "1")
    if env == "0":
        return False
    if _FUSED_MHA_DISABLED.get():
        return False                    # explicit kernel-suite kill switch
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # noqa: BLE001 — backend not initialized yet
        return False
    if pixels.ndim != 4 or pixels.dtype != jnp.bfloat16:
        return False
    b, h, w, c = pixels.shape
    p = patch_size
    if 128 % p or c > 128 // p:         # channel padding must reach 128 lanes
        return False
    if h % p or (w * (128 // p)) % 128 or d % 128:
        return False
    if p * 128 * d * 2 > 7 * 1024 * 1024:  # padded weight stays VMEM-resident
        return False
    # Crossover gate applies to the PER-SHARD batch under a dp mesh
    # (mesh_kernel_info, set by the batched entry points — VERDICT r3
    # item 8); global shapes under GSPMD would otherwise overstate it.
    info = _MESH_KERNEL_INFO.get()
    b_local = b // info.dp if info.dp > 1 and b % info.dp == 0 else b
    return env == "force" or b_local >= _MIN_BATCH
