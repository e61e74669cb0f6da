"""Algorithm value: T* search must beat uniform sampling on keyframe recall.

The reference's entire thesis (arXiv 2504.02259) is that detection-guided
adaptive temporal search finds short events that uniform sampling misses.
This test verifies that property holds for our engine: across several
synthetic videos with brief planted events placed OFF the uniform grid, the
searched keyframes must recall the events far better than 8 uniform frames.
"""

import numpy as np
import pytest

from tstar_tpu.bench.metrics import temporal_prf
from tstar_tpu.framework.heuristics import initialize_heuristic
from tstar_tpu.search.searcher import KeyframeSearcher
from tstar_tpu.video.synthetic import PlantedObject, write_synthetic_video

cv2 = pytest.importorskip("cv2")

DURATION = 180.0     # 3-minute videos
EVENT_LEN = 6.0      # short events: uniform-8 spacing is 22.5 s


@pytest.fixture(scope="module")
def scenes(tmp_path_factory):
    d = tmp_path_factory.mktemp("recall")
    rng = np.random.default_rng(0)
    scenes = []
    for i in range(4):
        start = float(rng.uniform(30, DURATION - 40))
        path = str(d / f"scene{i}.mp4")
        write_synthetic_video(
            path, duration_sec=DURATION, fps=10.0, hw=(96, 160),
            objects=[
                PlantedObject("couch", (start, start + EVENT_LEN),
                              (200, 40, 40), (0.5, 0.45), 0.4),
            ],
        )
        scenes.append((path, start))
    return scenes


def test_search_recall_beats_uniform(scenes):
    gt, searched, uniform = [], [], []
    for i, (path, start) in enumerate(scenes):
        gt_secs = np.arange(start, start + EVENT_LEN)
        gt.append(gt_secs)

        searcher = KeyframeSearcher(
            video_path=path,
            heuristic=initialize_heuristic("color-probe"),
            target_objects=["couch"],
            cue_objects=[],
            search_budget=1.0,
            confidence_threshold=0.5,
            seed=i,
        )
        _, timestamps = searcher.search()
        searched.append(np.asarray(timestamps))
        uniform.append(np.linspace(0, DURATION, 8))

    _, recall_search, _ = temporal_prf(gt, searched, threshold=5)
    _, recall_uniform, _ = temporal_prf(gt, uniform, threshold=5)

    # Uniform-8 on a 3-min video covers each event with probability ~16/22.5
    # per side; the search must be near-perfect and clearly better.
    assert recall_search >= 0.9, (recall_search, recall_uniform)
    assert recall_search > recall_uniform + 0.2, (recall_search, recall_uniform)
