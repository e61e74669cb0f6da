"""Pallas fused LayerNorm vs flax.linen.LayerNorm (interpret mode on CPU).

The kernel (kernels/layernorm.py) replaces XLA's ~10%-of-bandwidth
layernorm reduce fusions on the detector hot path (PERFORMANCE.md r3 trace);
enabling it must be numerically invisible, so parity vs stock flax is pinned
here at both dtypes, plus the routed wrapper module's fallback math
(models/transformer.py LayerNorm), which replaced nn.LayerNorm at every
encoder call site.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tstar_tpu.kernels.layernorm import fused_layernorm
from tstar_tpu.models.transformer import LayerNorm


def _rand_params(d, seed=2):
    s = jax.random.normal(jax.random.key(seed), (d,))
    b = jax.random.normal(jax.random.key(seed + 1), (d,))
    return s, b


class TestFusedKernel:
    def test_matches_flax_f32(self):
        d = 128
        s, b = _rand_params(d)
        x = jax.random.normal(jax.random.key(0), (33, d), jnp.float32) * 3 + 1
        got = fused_layernorm(x, s, b, eps=1e-5, interpret=True)
        want = nn.LayerNorm(epsilon=1e-5).apply(
            {"params": {"scale": s, "bias": b}}, x
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6
        )

    def test_matches_flax_bf16(self):
        d = 256
        s, b = _rand_params(d)
        x = jax.random.normal(jax.random.key(1), (4, 577, d), jnp.bfloat16)
        got = fused_layernorm(x, s, b, eps=1e-5, interpret=True)
        want = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16).apply(
            {"params": {"scale": s, "bias": b}}, x
        )
        assert got.dtype == jnp.bfloat16
        # one-pass vs fused-reduce op ordering: <= a couple of bf16 ulps
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.15, rtol=0.02,
        )

    def test_ragged_row_block(self):
        # rows not divisible by block_rows: the last block's padding rows
        # must not leak into real rows (row-independent stats).
        d = 128
        s, b = _rand_params(d)
        x = jax.random.normal(jax.random.key(3), (97, d), jnp.float32)
        got = fused_layernorm(x, s, b, eps=1e-5, block_rows=32, interpret=True)
        want = nn.LayerNorm(epsilon=1e-5).apply(
            {"params": {"scale": s, "bias": b}}, x
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6
        )

    def test_leading_shape_preserved(self):
        d = 128
        s, b = _rand_params(d)
        x = jax.random.normal(jax.random.key(4), (2, 3, 5, d), jnp.float32)
        got = fused_layernorm(x, s, b, eps=1e-5, interpret=True)
        assert got.shape == x.shape


class TestRoutedWrapper:
    @pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
    def test_fallback_matches_nn_layernorm(self, dt):
        d = 256
        s, b = _rand_params(d)
        x = (jax.random.normal(jax.random.key(5), (5, 7, d)) * 3 + 1).astype(dt)
        v = {"params": {"scale": s, "bias": b}}
        got = LayerNorm(epsilon=1e-5, dtype=dt).apply(v, x)
        want = nn.LayerNorm(epsilon=1e-5, dtype=dt).apply(v, x)
        atol = 0.0 if dt == jnp.float32 else 0.15
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=atol,
        )

    def test_param_tree_matches_nn_layernorm(self):
        x = jnp.zeros((2, 8, 128))
        ours = LayerNorm(epsilon=1e-5).init(jax.random.key(0), x)
        ref = nn.LayerNorm(epsilon=1e-5).init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(ours) == jax.tree_util.tree_structure(ref)
        assert {k: v.shape for k, v in ours["params"].items()} == {
            k: v.shape for k, v in ref["params"].items()
        }
