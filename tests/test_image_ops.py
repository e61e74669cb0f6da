"""Image-op parity: matmul-based resize vs cv2, grid packing layout."""

import numpy as np
import jax.numpy as jnp
import pytest

from tstar_tpu.kernels.image import (
    CLIP_MEAN,
    CLIP_STD,
    bilinear_resize,
    build_detector_grid,
    normalize_clip,
    pack_grid,
)

cv2 = pytest.importorskip("cv2")


class TestBilinearResize:
    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [
            ((190, 400), (95, 200)),   # cache -> reference cell size (2x down)
            ((190, 400), (192, 192)),  # cache -> detector cell
            ((190, 400), (768, 768)),  # cache -> verification input
            ((95, 200), (380, 800)),   # upscale
        ],
    )
    def test_matches_cv2(self, in_hw, out_hw):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(*in_hw, 3), dtype=np.uint8)
        want = cv2.resize(
            img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR
        ).astype(np.float32)
        got = np.asarray(bilinear_resize(jnp.asarray(img), out_hw))
        # cv2 uses fixed-point arithmetic internally; allow ~1 intensity level.
        assert np.abs(got - want).max() <= 1.0
        assert np.abs(got - want).mean() < 0.5

    def test_batched(self):
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 256, size=(4, 50, 60, 3), dtype=np.uint8)
        got = np.asarray(bilinear_resize(jnp.asarray(imgs), (25, 30)))
        for i in range(4):
            want = cv2.resize(imgs[i], (30, 25), interpolation=cv2.INTER_LINEAR)
            assert np.abs(got[i] - want).max() <= 1.0


class TestPackGrid:
    def test_row_major_layout(self):
        # Cell k must land at (row k//cols, col k%cols) — the correspondence
        # the score splat depends on (interface_searcher.py:296-306).
        cells = np.zeros((6, 4, 5, 3), np.float32)
        for k in range(6):
            cells[k] = k
        grid = np.asarray(pack_grid(jnp.asarray(cells), rows=2, cols=3))
        assert grid.shape == (8, 15, 3)
        for k in range(6):
            r, c = k // 3, k % 3
            patch = grid[r * 4 : (r + 1) * 4, c * 5 : (c + 1) * 5]
            assert (patch == k).all()


class TestNormalize:
    def test_clip_constants(self):
        x = np.full((2, 2, 3), 255, np.uint8)
        got = np.asarray(normalize_clip(jnp.asarray(x)))
        want = (1.0 - CLIP_MEAN) / CLIP_STD
        np.testing.assert_allclose(got[0, 0], want, rtol=1e-5)


class TestBuildDetectorGrid:
    def test_gather_and_placement(self):
        # Cache where frame s is a constant image of intensity s; the packed
        # grid must place sampled frames at their row-major cells.
        n, ch, cw = 32, 20, 40
        cache = np.zeros((n, ch, cw, 3), np.uint8)
        for s in range(n):
            cache[s] = s * 7 % 251
        secs = jnp.asarray([3, 9, 1, 30, 12, 8, 2, 5, 11, 13, 17, 19, 23, 29, 0, 31])
        out = np.asarray(
            build_detector_grid(jnp.asarray(cache), secs, (4, 4), 64, dtype=jnp.float32)
        )
        assert out.shape == (1, 64, 64, 3)
        # invert normalization at a cell center and check intensity
        for k, s in enumerate(np.asarray(secs)):
            r, c = k // 4, k % 4
            pix = out[0, r * 16 + 8, c * 16 + 8]
            intensity = (pix * CLIP_STD + CLIP_MEAN) * 255.0
            np.testing.assert_allclose(intensity, s * 7 % 251, atol=1.0)


class TestComposedPatchProjection:
    """The composed cache->patch-embedding projection must equal the pixel
    chain PatchEmbed(build_detector_grid(...)) up to float reassociation
    (kernels/image.py composed_patch_projection / grid_patch_embeddings)."""

    def test_alignment_gate(self):
        from tstar_tpu.kernels.image import composed_patch_projection

        k = np.random.default_rng(0).normal(size=(32, 32, 3, 8)).astype(np.float32)
        got = composed_patch_projection(k, (192, 384), (192, 192), 32)
        assert got is not None
        assert got[2] == (32, 64)
        # fractional source blocks (190 rows -> 192) are not block-aligned
        assert composed_patch_projection(k, (190, 384), (192, 192), 32) is None
        # cell not a multiple of the patch size
        assert composed_patch_projection(k, (192, 384), (100, 192), 32) is None

    def test_matches_pixel_chain(self):
        from tstar_tpu.kernels.image import (
            composed_patch_projection,
            grid_patch_embeddings,
        )

        rng = np.random.default_rng(1)
        d = 8
        kernel = rng.normal(size=(32, 32, 3, d)).astype(np.float32) * 0.05
        cache = rng.integers(0, 256, (20, 192, 384, 3)).astype(np.uint8)
        secs = jnp.asarray(rng.integers(0, 20, (16,)))

        w, b, src = composed_patch_projection(kernel, (192, 384), (192, 192), 32)
        got = grid_patch_embeddings(
            jnp.asarray(cache), secs, jnp.asarray(w), jnp.asarray(b),
            (4, 4), src, dtype=jnp.float32,
        )

        # pixel chain: grid image -> patchify -> patch matmul
        from tstar_tpu.models.owlvit import patchify

        pixels = build_detector_grid(
            jnp.asarray(cache), secs, (4, 4), 768, dtype=jnp.float32
        )
        patches = patchify(pixels, 32)
        want = jnp.einsum("bpk,kd->bpd", patches, kernel.reshape(-1, d))

        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-4
        )
