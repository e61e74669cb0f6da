"""Parity tests for the single-block fused MHA kernel.

``kernels/attention.py fused_mha_from_qkv`` routes encoder self-attention
(reference runs stock HF attention, ``TStar/interface_heuristic.py:200``)
through a layout-native Pallas kernel on TPU.  These tests pin its math to
``jax.nn.dot_product_attention`` in interpreter mode so the hermetic CPU
suite covers the kernel the TPU path runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tstar_tpu.kernels.attention import fused_mha_from_qkv, use_fused_mha


def _reference(qkv: jax.Array, num_heads: int) -> jax.Array:
    b, s, three_d = qkv.shape
    d = three_d // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(b, s, num_heads, d // num_heads)
    out = jax.nn.dot_product_attention(split(q), split(k), split(v))
    return out.reshape(b, s, d)


@pytest.mark.parametrize(
    "b,s,heads,dh",
    [(1, 64, 2, 64), (2, 96, 4, 64), (1, 577, 2, 64)],
)
def test_fused_mha_matches_dpa_f32(b, s, heads, dh):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * heads * dh)), jnp.float32)
    got = fused_mha_from_qkv(qkv, heads, interpret=True)
    want = _reference(qkv, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_mha_matches_dpa_bf16():
    # bf16 inputs: the kernel casts probs to bf16 for the AV matmul (same
    # approximation class as the bf16 tower); tolerance is bf16-level.
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.normal(size=(2, 80, 3 * 4 * 64)), jnp.bfloat16)
    got = fused_mha_from_qkv(qkv, 4, interpret=True).astype(jnp.float32)
    want = _reference(qkv.astype(jnp.float32), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


@pytest.mark.parametrize("hpb", ["4", "6", "12"])
def test_hpb_override_bit_identical(hpb, monkeypatch):
    """TSTAR_MHA_HPB only changes program granularity: results must be
    BIT-identical to the default 2-heads-per-program kernel."""
    rng = np.random.default_rng(2)
    heads = 12
    qkv = jnp.asarray(rng.normal(size=(2, 64, 3 * heads * 64)), jnp.float32)
    want = fused_mha_from_qkv(qkv, heads, interpret=True)
    monkeypatch.setenv("TSTAR_MHA_HPB", hpb)
    fused_mha_from_qkv.clear_cache()
    try:
        got = fused_mha_from_qkv(qkv, heads, interpret=True)
    finally:
        monkeypatch.delenv("TSTAR_MHA_HPB")
        fused_mha_from_qkv.clear_cache()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_p16_probs_matches_dpa_bf16(monkeypatch):
    """TSTAR_MHA_P16 (bf16 probs + bf16-derived row sum) stays in the bf16
    approximation class of the default kernel."""
    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.normal(size=(2, 80, 3 * 4 * 64)), jnp.bfloat16)
    monkeypatch.setenv("TSTAR_MHA_P16", "1")
    fused_mha_from_qkv.clear_cache()
    try:
        got = fused_mha_from_qkv(qkv, 4, interpret=True).astype(jnp.float32)
    finally:
        monkeypatch.delenv("TSTAR_MHA_P16")
        fused_mha_from_qkv.clear_cache()
    want = _reference(qkv.astype(jnp.float32), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)
    # f32 inputs: the knob must be a no-op (gated to bf16 towers).
    qkv32 = jnp.asarray(rng.normal(size=(1, 64, 3 * 2 * 64)), jnp.float32)
    monkeypatch.setenv("TSTAR_MHA_P16", "1")
    fused_mha_from_qkv.clear_cache()
    try:
        got32 = fused_mha_from_qkv(qkv32, 2, interpret=True)
    finally:
        monkeypatch.delenv("TSTAR_MHA_P16")
        fused_mha_from_qkv.clear_cache()
    np.testing.assert_array_equal(
        np.asarray(got32), np.asarray(fused_mha_from_qkv(qkv32, 2, interpret=True))
    )


def test_hpb_override_invalid_values_keep_default(monkeypatch):
    """Values that break head-count / lane-tiling divisibility are ignored."""
    rng = np.random.default_rng(3)
    heads = 12
    qkv = jnp.asarray(rng.normal(size=(1, 32, 3 * heads * 64)), jnp.float32)
    want = fused_mha_from_qkv(qkv, heads, interpret=True)
    for bad in ("5", "24", "1"):   # 12 % 5, 12 // 24 == 0, 64 lanes % 128
        monkeypatch.setenv("TSTAR_MHA_HPB", bad)
        fused_mha_from_qkv.clear_cache()
        try:
            got = fused_mha_from_qkv(qkv, heads, interpret=True)
        finally:
            monkeypatch.delenv("TSTAR_MHA_HPB")
            fused_mha_from_qkv.clear_cache()
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gate_requires_tpu_and_no_bias():
    qkv = jnp.zeros((1, 577, 3 * 768), jnp.bfloat16)
    # CPU backend (the hermetic suite) must never route to the kernel.
    assert not use_fused_mha(qkv, 12, None)
    assert not use_fused_mha(qkv, 12, jnp.zeros((1, 1, 577, 577)))
    # Tiny text-tower sequences stay on XLA's fusion regardless of backend.
    assert not use_fused_mha(jnp.zeros((1, 16, 3 * 768), jnp.bfloat16), 12, None)


def test_custom_partitioning_batch_sharded():
    # The kernel's custom_partitioning rule: batch-sharded (dp) inputs run
    # the kernel per shard and the output stays batch-sharded.  Exercised
    # on the suite's 8 virtual CPU devices in interpreter mode.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-virtual-device CPU suite config")
    mesh = Mesh(np.asarray(devs[:4]), ("data",))
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.normal(size=(8, 64, 3 * 2 * 64)), jnp.float32)
    sharded = jax.device_put(qkv, NamedSharding(mesh, P("data", None, None)))
    got = fused_mha_from_qkv(sharded, 2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_reference(qkv, 2)), atol=2e-5
    )
    spec = got.sharding.spec
    assert spec and spec[0] == "data", spec


def _to_grouped(qkv: jax.Array, num_heads: int, groups: int) -> jax.Array:
    """Plain [q|k|v] -> shard-major grouped [q_0|k_0|v_0|...] layout."""
    d = qkv.shape[-1] // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qs, ks, vs = (jnp.split(t, groups, axis=-1) for t in (q, k, v))
    return jnp.concatenate(
        [t for g in range(groups) for t in (qs[g], ks[g], vs[g])], axis=-1
    )


@pytest.mark.parametrize("groups", [2, 4])
def test_grouped_layout_matches_plain(groups):
    # The tensor-parallel grouped layout must be bit-identical to the plain
    # layout when executed unsharded (same per-head math, contiguous head
    # groups -> same head-major output).
    rng = np.random.default_rng(3)
    heads, dh = 8, 64
    qkv = jnp.asarray(rng.normal(size=(2, 96, 3 * heads * dh)), jnp.float32)
    grouped = _to_grouped(qkv, heads, groups)
    got = fused_mha_from_qkv(grouped, heads, interpret=True, tp_groups=groups)
    want = _reference(qkv, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tp_custom_partitioning_last_axis_sharded():
    # A model-axis sharding of the grouped layout must run a LOCAL kernel
    # with H/T heads per shard (no re-gather) and leave the output sharded
    # on its last (head-major feature) axis.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-virtual-device CPU suite config")
    mesh = Mesh(np.asarray(devs[:4]).reshape(2, 2), ("data", "model"))
    rng = np.random.default_rng(4)
    heads, dh, groups = 4, 64, 2
    qkv = jnp.asarray(rng.normal(size=(4, 64, 3 * heads * dh)), jnp.float32)
    grouped = _to_grouped(qkv, heads, groups)
    sharded = jax.device_put(
        grouped, NamedSharding(mesh, P("data", None, "model"))
    )
    got = fused_mha_from_qkv(sharded, heads, interpret=True, tp_groups=groups)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_reference(qkv, heads)), atol=2e-5
    )
    spec = got.sharding.spec
    assert tuple(spec) == ("data", None, "model"), spec


def test_mesh_info_per_shard_batch_gate(monkeypatch):
    # VERDICT r3 item 8: the batch crossover applies to the PER-SHARD batch.
    # A dp=8 division of 8 videos leaves 1 per shard -> kernel off, even
    # though the global batch passes the gate.
    from tstar_tpu.kernels.attention import fused_mha_plan, mesh_kernel_info

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert fused_mha_plan(8, 577, 3 * 768, 12, None) == 1
    with mesh_kernel_info(dp=8):
        assert fused_mha_plan(8, 577, 3 * 768, 12, None) is None
        assert fused_mha_plan(64, 577, 3 * 768, 12, None) == 1
    assert fused_mha_plan(8, 577, 3 * 768, 12, None) == 1


def test_mesh_info_tp_plan(monkeypatch):
    # Tensor-parallel meshes now plan the grouped layout instead of
    # disabling (VERDICT r3 item 2) — unless the local heads can't tile
    # 128-lane blocks (12 heads / tp=4 = 3 local heads at Dh=64).
    from tstar_tpu.kernels.attention import fused_mha_plan, mesh_kernel_info

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with mesh_kernel_info(dp=1, tp=2):
        assert fused_mha_plan(8, 577, 3 * 768, 12, None) == 2
    with mesh_kernel_info(dp=1, tp=4):
        assert fused_mha_plan(8, 577, 3 * 768, 12, None) is None


def test_infer_mesh_kernel_info():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tstar_tpu.kernels.attention import infer_mesh_kernel_info

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-virtual-device CPU suite config")
    mesh = Mesh(np.asarray(devs[:8]).reshape(4, 2), ("data", "model"))
    x = jax.device_put(
        jnp.zeros((8, 16)), NamedSharding(mesh, P("data", None))
    )
    info = infer_mesh_kernel_info(x)
    assert (info.dp, info.tp) == (4, 2)
    assert infer_mesh_kernel_info(jnp.zeros((4,))).dp == 1


def test_mesh_disable_context(monkeypatch):
    # GSPMD cannot partition a pallas_call: mesh-sharded traces enter
    # fused_mha_disabled() and the gate must honor it even when every
    # other condition (forced via env) passes.
    from tstar_tpu.kernels.attention import fused_mha_disabled

    monkeypatch.setenv("TSTAR_FUSED_MHA", "force")
    qkv = jnp.zeros((16, 577, 3 * 768), jnp.bfloat16)
    on_tpu = jax.default_backend() == "tpu"
    assert use_fused_mha(qkv, 12, None) == on_tpu
    with fused_mha_disabled():
        assert not use_fused_mha(qkv, 12, None)
    assert use_fused_mha(qkv, 12, None) == on_tpu
