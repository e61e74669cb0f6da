"""Parity tests for the fused quantize->int8-matmul kernel.

``kernels/quant_matmul.py`` must compute exactly what ``ops/quant.py
dense_w8a8``'s unfused XLA path computes (same absmax/round/clip, i32
accumulation, dequant multiply order, up to one-ulp f32 reassociation in
the dequant epilogue) — interpreter mode pins that here
so the hermetic CPU suite covers the kernel the TPU int8 knob runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tstar_tpu.kernels.quant_matmul import use_w8a8_kernel, w8a8_matmul
from tstar_tpu.ops.quant import dense_w8a8, quantize_weight


def _setup(rng, rows, k, n, dtype):
    x = jnp.asarray(rng.normal(size=(2, rows, k)), dtype)
    w_i8, w_scale = quantize_weight(rng.normal(size=(k, n)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(n,)) * 0.1, jnp.float32)
    return x, jnp.asarray(w_i8), jnp.asarray(w_scale), bias


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_dense_w8a8(dtype):
    rng = np.random.default_rng(0)
    x, w_i8, w_scale, bias = _setup(rng, 96, 128, 256, dtype)
    got = w8a8_matmul(
        x, w_i8, w_scale, bias, out_dtype_name=jnp.dtype(dtype).name,
        interpret=True,
    )
    # CPU backend -> dense_w8a8 takes its unfused XLA path.
    want = dense_w8a8(x, w_i8, w_scale, bias, out_dtype=dtype)
    if dtype == jnp.bfloat16:
        # the one-ulp f32 epilogue reassociation can land on a bf16
        # rounding boundary: allow one bf16 ulp at the output magnitude
        atol, rtol = 0.3, 0.0
    else:
        atol, rtol = 1e-5, 1e-6
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=rtol, atol=atol,
    )


def test_no_bias_matches():
    rng = np.random.default_rng(1)
    x, w_i8, w_scale, _ = _setup(rng, 64, 128, 128, jnp.float32)
    got = w8a8_matmul(
        x, w_i8, w_scale, jnp.zeros((128,), jnp.float32),
        out_dtype_name="float32", interpret=True,
    )
    want = dense_w8a8(x, w_i8, w_scale, None, out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-5
    )


def test_gate():
    x = jnp.zeros((4, 577, 768), jnp.bfloat16)
    # CPU backend: never.
    assert not use_w8a8_kernel(x, 768, 3072)
    # weight too big for VMEM residency / non-tileable dims.
    assert not use_w8a8_kernel(x, 768, 4096)
    assert not use_w8a8_kernel(x, 768, 100)


def test_custom_partitioning_row_sharded():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-virtual-device CPU suite config")
    mesh = Mesh(np.asarray(devs[:4]), ("data",))
    rng = np.random.default_rng(2)
    x, w_i8, w_scale, bias = _setup(rng, 16, 128, 256, jnp.float32)
    x8 = jnp.concatenate([x] * 4, axis=0)                 # (8, 16, 128)
    xs = jax.device_put(x8, NamedSharding(mesh, P("data", None, None)))
    got = w8a8_matmul(
        xs, w_i8, w_scale, bias, out_dtype_name="float32", interpret=True
    )
    want = dense_w8a8(x8, w_i8, w_scale, bias, out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-5
    )
