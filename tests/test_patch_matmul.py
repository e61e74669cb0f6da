"""Parity tests for the fused patchify->patch-embedding kernel.

``kernels/patch_matmul.py`` must equal ``models/owlvit.patchify`` followed
by the PatchEmbed einsum (the reference's HF conv patch embedding,
`TStar/interface_heuristic.py:200-210`); interpreter mode pins that here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tstar_tpu.kernels.patch_matmul import (
    patch_embed_matmul,
    use_patch_embed_kernel,
)
from tstar_tpu.models.owlvit import patchify


def _reference(pixels, kernel):
    x = patchify(pixels, kernel.shape[0])
    w = kernel.reshape(-1, kernel.shape[-1])
    return jnp.einsum("bpk,kd->bpd", x, w)


@pytest.mark.parametrize("b,hw,p,c,d", [(2, 64, 16, 3, 128), (1, 96, 32, 3, 256)])
def test_matches_patchify_einsum_f32(b, hw, p, c, d):
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(b, hw, hw, c)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(p, p, c, d)) * 0.05, jnp.float32)
    got = patch_embed_matmul(pixels, kernel, interpret=True)
    want = _reference(pixels, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_matches_patchify_einsum_bf16():
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.bfloat16)
    kernel = jnp.asarray(rng.normal(size=(32, 32, 3, 128)) * 0.05, jnp.bfloat16)
    got = patch_embed_matmul(pixels, kernel, interpret=True)
    want = _reference(pixels.astype(jnp.float32), kernel.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=5e-2, rtol=2e-2
    )


def test_gate():
    pixels = jnp.zeros((16, 768, 768, 3), jnp.bfloat16)
    # CPU backend: never.
    assert not use_patch_embed_kernel(pixels, 32, 768)
    # f32 pixels / misaligned shapes stay on the einsum path.
    assert not use_patch_embed_kernel(
        jnp.zeros((16, 768, 768, 3), jnp.float32), 32, 768
    )
    assert not use_patch_embed_kernel(
        jnp.zeros((16, 770, 768, 3), jnp.bfloat16), 32, 768
    )


def test_custom_partitioning_batch_sharded():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-virtual-device CPU suite config")
    mesh = Mesh(np.asarray(devs[:4]), ("data",))
    rng = np.random.default_rng(2)
    pixels = jnp.asarray(rng.normal(size=(8, 64, 64, 3)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(16, 16, 3, 128)) * 0.05, jnp.float32)
    ps = jax.device_put(
        pixels, NamedSharding(mesh, P("data", None, None, None))
    )
    got = patch_embed_matmul(ps, kernel, interpret=True)
    want = _reference(pixels, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
