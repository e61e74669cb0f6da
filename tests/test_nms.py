"""NMS parity vs a NumPy greedy-reference implementation
(torchvision-compatible semantics; torchvision itself is not in this image)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tstar_tpu.ops.nms import batched_class_nms, box_iou, nms


def _random_boxes(rng, n):
    xy = rng.random((n, 2)) * 100
    wh = rng.random((n, 2)) * 30 + 1
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def np_iou(a, b):
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def np_nms(boxes, scores, thresh):
    """Greedy NMS, torchvision semantics: keep highest score, drop IoU>thresh."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    iou = np_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return np.asarray(keep, np.int64)


class TestIoU:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        a, b = _random_boxes(rng, 8), _random_boxes(rng, 5)
        got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-6)


class TestNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
    def test_matches_reference(self, seed, thresh):
        rng = np.random.default_rng(seed)
        boxes = _random_boxes(rng, 64)
        scores = rng.random(64).astype(np.float32)
        want = np_nms(boxes, scores, thresh)
        keep, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), thresh, 64)
        got = np.asarray(keep)[np.asarray(valid)]
        np.testing.assert_array_equal(got, want)

    def test_max_outputs_truncates(self):
        rng = np.random.default_rng(3)
        boxes = _random_boxes(rng, 32)
        scores = rng.random(32).astype(np.float32)
        keep, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.99, 5)
        assert valid.shape == (5,)
        assert np.asarray(valid).sum() == 5   # near-unity IoU threshold keeps all

    def test_class_aware_never_crosses_classes(self):
        rng = np.random.default_rng(4)
        boxes = _random_boxes(rng, 48)
        scores = rng.random(48).astype(np.float32)
        cls = rng.integers(0, 3, 48)
        # reference: per-class greedy NMS merged by score
        want = []
        for c in range(3):
            idx = np.nonzero(cls == c)[0]
            kept = np_nms(boxes[idx], scores[idx], 0.5)
            want.extend(idx[kept].tolist())
        want = sorted(want, key=lambda i: -scores[i])
        keep, valid = batched_class_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls), 0.5, 48
        )
        got = np.asarray(keep)[np.asarray(valid)]
        np.testing.assert_array_equal(got, np.asarray(want))
