"""Parity tests for the fused LayerNorm->matmul kernel.

``kernels/ln_matmul.py`` folds each pre-norm LN into the projection matmul
it feeds (ln1 -> qkv, ln2 -> fc1; the reference runs the unfused HF
CLIP-style blocks, `TStar/interface_heuristic.py:200-280`).  Interpreter
mode pins the kernel math to the unfused LayerNorm + Dense pair the
hermetic CPU suite runs everywhere else.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tstar_tpu.kernels.ln_matmul import ln_matmul, use_ln_matmul


def _reference(x, scale, bias, w, b, eps):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
    mul = jax.lax.rsqrt(var + eps) * scale.astype(dtype).astype(jnp.float32)
    h = ((x32 - mean) * mul + bias.astype(dtype).astype(jnp.float32)).astype(dtype)
    return jnp.einsum("...sd,dn->...sn", h, w.astype(dtype)) + b.astype(dtype)


@pytest.mark.parametrize("rows,d,n", [(64, 128, 256), (577, 128, 384)])
def test_matches_unfused_f32(rows, d, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, rows, d)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.normal(size=(d,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, n)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(n,)) * 0.1, jnp.float32)
    got = ln_matmul(x, scale, bias, w, b, eps=1e-5, interpret=True)
    want = _reference(x, scale, bias, w, b, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_matches_unfused_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 96, 256)), jnp.bfloat16)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(256,)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.normal(size=(256,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)
    got = ln_matmul(x, scale, bias, w, b, eps=1e-5, interpret=True)
    want = _reference(x, scale, bias, w.astype(jnp.bfloat16), b, 1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=2e-2,
    )


def test_gate():
    big = jnp.zeros((16, 577, 768), jnp.bfloat16)
    # CPU backend: never.
    assert not use_ln_matmul(big, 2304)
    # f32 or tiny-rows stay unfused regardless of backend.
    assert not use_ln_matmul(jnp.zeros((16, 577, 768), jnp.float32), 2304)
    assert not use_ln_matmul(jnp.zeros((1, 16, 768), jnp.bfloat16), 2304)
    # weight too big for VMEM residency.
    assert not use_ln_matmul(big, 4096)


def test_custom_partitioning_row_sharded():
    # dp meshes shard the flattened row axis; the rule must keep the
    # output row-sharded and match the unsharded result.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-virtual-device CPU suite config")
    mesh = Mesh(np.asarray(devs[:4]), ("data",))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 32, 128)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(128,)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.normal(size=(128,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(256,)) * 0.1, jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    got = ln_matmul(xs, scale, bias, w, b, eps=1e-5, interpret=True)
    want = _reference(x, scale, bias, w, b, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_encoder_layer_param_tree_unchanged():
    # The EncoderLayer restructure (LN params declared via _LayerNormParams
    # and passed into the projections) must keep the exact checkpoint tree.
    from tstar_tpu.models.transformer import EncoderLayer

    layer = EncoderLayer(num_heads=4, intermediate_size=64, dtype=jnp.float32)
    variables = layer.init(jax.random.key(0), jnp.zeros((1, 8, 32)))
    params = variables["params"]
    assert set(params) == {"layer_norm1", "layer_norm2", "self_attn", "mlp"}
    assert set(params["layer_norm1"]) == {"scale", "bias"}
    assert set(params["self_attn"]) == {"q_proj", "k_proj", "v_proj", "out_proj"}
    assert set(params["mlp"]) == {"fc1", "fc2"}
    assert params["mlp"]["fc1"]["kernel"].shape == (32, 64)
