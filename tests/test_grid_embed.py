"""Parity tests for the fused cache->grid->patch-embedding Pallas path.

``kernels/grid_embed.py`` must equal the production pixel chain
(``kernels/image.build_detector_grid`` -> ``models/owlvit.patchify`` ->
patch-embed matmul; the reference's OpenCV grid assembly + HF conv patch
embedding, ``TStar/interface_searcher.py:171-188``,
``interface_heuristic.py:200-210``).  Interpreter mode pins that here; the
e2e A/B lives in scripts/ab_grid_embed.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tstar_tpu.kernels.grid_embed import (
    _height_matrix,
    _width_affine,
    grid_cell_embed,
    use_grid_embed_kernel,
)
from tstar_tpu.kernels.image import build_detector_grid
from tstar_tpu.models.owlvit import patchify
from tstar_tpu.utils.config import SearchConfig

# Geometry: 32x64 cache frames -> 2x2 grid of 32x32 cells (64^2 canvas),
# patch 8 (c_pad = 16), 64 canvas patches.  Height resize is identity.
CH, CW = 32, 64
ROWS, COLS = 2, 2
SIZE, P = 64, 8
D = 128
N_FRAMES = 10


def _setup(seed=0, d=D, ch=CH, cell_h=SIZE // ROWS):
    rng = np.random.default_rng(seed)
    cache = rng.integers(0, 256, (N_FRAMES, ch, CW, 3), dtype=np.uint8)
    hwio = rng.normal(size=(P, P, 3, d)).astype(np.float32) * 0.05
    cell_w = SIZE // COLS
    awk, bias = _width_affine(CW, cell_w, 128 // P)
    ah = _height_matrix(ch, cell_h)
    return (
        jnp.asarray(cache), jnp.asarray(hwio),
        jnp.asarray(awk), jnp.asarray(bias),
        None if ah is None else jnp.asarray(ah),
    )


def _pixel_chain(cache, secs, hwio, cell_h=SIZE // ROWS):
    grid = build_detector_grid(
        cache, secs, (ROWS, COLS), ROWS * cell_h, dtype=jnp.float32
    )
    patches = patchify(grid, P)
    return jnp.einsum("bpk,kd->bpd", patches, hwio.reshape(-1, hwio.shape[-1]))


def _kernel(cache, secs, awk, bias, ah, hwio, cell_h=SIZE // ROWS):
    return grid_cell_embed(
        cache, secs, awk, bias, ah, hwio,
        grid_shape=(ROWS, COLS), cell_hw=(cell_h, SIZE // COLS),
        patch_size=P, interpret=True,
    )


def test_matches_pixel_chain_identity_height():
    cache, hwio, awk, bias, ah = _setup()
    assert ah is None                       # 32 -> 32 is the identity
    secs = jnp.asarray([3, 0, 7, 5], jnp.int32)
    got = _kernel(cache[None], secs[None], awk, bias, ah, hwio)
    want = _pixel_chain(cache, secs, hwio)
    assert got.shape == (1, 64, D)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.12, rtol=0.05
    )


def test_matches_pixel_chain_real_height_resize():
    """Non-identity height path (40-row cache -> 32-row cells)."""
    cache, hwio, awk, bias, ah = _setup(seed=1, ch=40)
    assert ah is not None and ah.shape == (32, 40)
    secs = jnp.asarray([1, 9, 2, 4], jnp.int32)
    got = _kernel(cache[None], secs[None], awk, bias, ah, hwio)
    want = _pixel_chain(cache, secs, hwio)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.15, rtol=0.05
    )


def test_canvas_patch_order():
    """Cell k's patches land at the canvas positions the position
    embeddings / box bias expect (row-major over the full canvas)."""
    cache, hwio, awk, bias, ah = _setup(seed=2)
    const = np.zeros((N_FRAMES, CH, CW, 3), np.uint8)
    for f in range(N_FRAMES):
        const[f] = 17 * f
    cache = jnp.asarray(const)
    secs = jnp.asarray([4, 1, 8, 6], jnp.int32)
    got = np.asarray(
        _kernel(cache[None], secs[None], awk, bias, ah, hwio)[0], np.float32
    )
    want = np.asarray(_pixel_chain(cache, secs, hwio)[0])
    np.testing.assert_allclose(got, want, atol=0.12, rtol=0.05)
    # Distinct constants per frame -> patches of different cells differ.
    nph = (SIZE // ROWS) // P
    npc = COLS * (SIZE // COLS) // P
    row0 = got[:npc]                        # canvas patch row 0: cells 0, 1
    assert not np.allclose(row0[0], row0[nph + 1], atol=1e-3)


def test_batched_matches_per_video():
    cache, hwio, awk, bias, ah = _setup(seed=3)
    rng = np.random.default_rng(33)
    bsz = 3
    caches = jnp.asarray(
        rng.integers(0, 256, (bsz, N_FRAMES, CH, CW, 3), dtype=np.uint8)
    )
    secs = jnp.asarray(rng.integers(0, N_FRAMES, (bsz, ROWS * COLS)), jnp.int32)
    got = _kernel(caches, secs, awk, bias, ah, hwio)
    for v in range(bsz):
        one = _kernel(caches[v][None], secs[v][None], awk, bias, ah, hwio)
        np.testing.assert_array_equal(np.asarray(got[v]), np.asarray(one[0]))


def test_custom_partitioning_batch_sharded():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-virtual-device CPU suite config")
    mesh = Mesh(np.asarray(devs[:4]), ("data",))
    cache, hwio, awk, bias, ah = _setup(seed=4)
    rng = np.random.default_rng(44)
    bsz = 4
    caches = jnp.asarray(
        rng.integers(0, 256, (bsz, N_FRAMES, CH, CW, 3), dtype=np.uint8)
    )
    secs = jnp.asarray(rng.integers(0, N_FRAMES, (bsz, ROWS * COLS)), jnp.int32)
    want = _kernel(caches, secs, awk, bias, ah, hwio)
    cs = jax.device_put(
        caches, NamedSharding(mesh, Pspec("data", None, None, None, None))
    )
    ss = jax.device_put(secs, NamedSharding(mesh, Pspec("data", None)))
    got = _kernel(cs, ss, awk, bias, ah, hwio)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gate():
    cfg = SearchConfig()
    shape5 = (16, 1024, 192, 384, 3)
    # CPU backend: never (unless interpret).
    assert not use_grid_embed_kernel(shape5, 768, 32, 768, cfg)
    # Env off.
    import os

    os.environ["TSTAR_GRID_EMBED"] = "0"
    try:
        assert not use_grid_embed_kernel(shape5, 768, 32, 768, cfg)
    finally:
        os.environ.pop("TSTAR_GRID_EMBED")
    # Interpret mode forces on (hermetic testing).
    os.environ["TSTAR_GRID_EMBED"] = "interpret"
    try:
        assert use_grid_embed_kernel(shape5, 768, 32, 768, cfg)
        # ... but not for patch sizes the padded layout can't express.
        assert not use_grid_embed_kernel(shape5, 768, 48, 768, cfg)
    finally:
        os.environ.pop("TSTAR_GRID_EMBED")


class TestScorerIntegration:
    """The batched scorer routes through the kernel under
    TSTAR_GRID_EMBED=interpret and matches the pixel-chain path."""

    def _build(self, monkeypatch, env):
        from tstar_tpu.models.clip_tokenizer import HashTokenizer
        from tstar_tpu.models.owlvit import (
            OwlViTConfig,
            OwlViTDetector,
            TextConfig,
            VisionConfig,
        )
        from tstar_tpu.parallel.batched import stack_scorers
        from tstar_tpu.search.detector_scorer import make_owlvit_scorer

        if env is None:
            monkeypatch.delenv("TSTAR_GRID_EMBED", raising=False)
        else:
            monkeypatch.setenv("TSTAR_GRID_EMBED", env)
        tiny = OwlViTConfig(
            vision=VisionConfig(
                hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, patch_size=16, image_size=64,
            ),
            text=TextConfig(
                vocab_size=100, hidden_size=24, num_layers=2, num_heads=4,
                intermediate_size=48, max_length=8,
            ),
            projection_dim=24,
        )
        model = OwlViTDetector(tiny, dtype=jnp.float32)
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((2, 8), jnp.int32),
        )
        cfg = SearchConfig(search_budget=0.5)
        tok = HashTokenizer(vocab_size=100, context=8)
        rng = np.random.default_rng(7)
        scorers = [
            make_owlvit_scorer(
                model, variables,
                jnp.asarray(rng.integers(
                    0, 256, (32, 20, 40, 3), dtype=np.uint8
                )),
                ["couch"], ["tv"], tok, cfg,
            )
            for _ in range(2)
        ]
        return stack_scorers(scorers, cfg)

    def test_batched_score_grid_kernel_vs_pixel_chain(self, monkeypatch):
        secs = jnp.asarray(
            np.random.default_rng(9).integers(0, 32, (2, 16)), jnp.int32
        )
        sk = self._build(monkeypatch, "interpret")
        assert sk.gb_awk is not None
        assert sk._use_grid_embed_kernel(sk.cache.shape)
        conf_k, pres_k = sk.score_grid_batch(secs)
        s0 = self._build(monkeypatch, "0")
        assert s0.gb_awk is None
        assert not s0._use_grid_embed_kernel(s0.cache.shape)
        conf_p, pres_p = s0.score_grid_batch(secs)
        # bf16 resize weights vs the f32 pixel chain through a tiny random
        # detector: scores agree to bf16-propagation tolerance.
        np.testing.assert_allclose(
            np.asarray(conf_k), np.asarray(conf_p), atol=5e-2, rtol=5e-2
        )
        assert conf_k.shape == (2, 16) and pres_k.shape == pres_p.shape

    def test_default_cpu_stays_on_pixel_chain(self, monkeypatch):
        s = self._build(monkeypatch, None)
        assert s.gb_awk is None            # not computed off-TPU
        assert not s._use_grid_embed_kernel(s.cache.shape)
