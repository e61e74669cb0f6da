"""Pallas fused grid-builder vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tstar_tpu.kernels.image import build_detector_grid
from tstar_tpu.kernels.pallas_grid import build_detector_grid_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_xla_path(seed):
    rng = np.random.default_rng(seed)
    n, ch, cw = 64, 20, 40
    cache = jnp.asarray(rng.integers(0, 256, (n, ch, cw, 3), dtype=np.uint8))
    secs = jnp.asarray(rng.choice(n, 16, replace=False).astype(np.int32))
    want = np.asarray(
        build_detector_grid(cache, secs, (4, 4), 64, dtype=jnp.float32)
    )
    got = np.asarray(
        build_detector_grid_pallas(
            cache, secs, (4, 4), 64, dtype=jnp.float32, interpret=True
        )
    )
    assert got.shape == want.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bf16_output_close(seed=3):
    rng = np.random.default_rng(seed)
    cache = jnp.asarray(rng.integers(0, 256, (32, 20, 40, 3), dtype=np.uint8))
    secs = jnp.arange(16, dtype=jnp.int32)
    want = np.asarray(
        build_detector_grid(cache, secs, (4, 4), 64, dtype=jnp.float32)
    )
    got = np.asarray(
        build_detector_grid_pallas(
            cache, secs, (4, 4), 64, dtype=jnp.bfloat16, interpret=True
        )
    ).astype(np.float32)
    assert np.abs(got - want).max() < 0.05


def test_gather_correct_cells():
    # constant-intensity frames: each grid cell must equal its source frame.
    cache_np = np.zeros((32, 20, 40, 3), np.uint8)
    for s in range(32):
        cache_np[s] = s * 5
    secs = jnp.asarray([7, 1, 30, 2, 9, 8, 3, 5, 11, 13, 17, 19, 23, 29, 0, 31],
                       jnp.int32)
    out = np.asarray(
        build_detector_grid_pallas(
            jnp.asarray(cache_np), secs, (4, 4), 64, dtype=jnp.float32,
            interpret=True,
        )
    )
    from tstar_tpu.kernels.image import CLIP_MEAN, CLIP_STD

    for k, s in enumerate(np.asarray(secs)):
        r, c = k // 4, k % 4
        pix = out[0, r * 16 + 8, c * 16 + 8]
        intensity = (pix * CLIP_STD + CLIP_MEAN) * 255.0
        np.testing.assert_allclose(intensity, s * 5, atol=0.5)
