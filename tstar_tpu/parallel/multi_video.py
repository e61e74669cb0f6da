"""User-facing batched multi-video search (SURVEY.md config 5).

Searches B videos concurrently on one chip or a mesh: frame caches pad to a
shared bucket length, per-video states stack on a leading axis sharded over
the ``data`` mesh axis, and every iteration runs ONE detector forward over
B grid images (vs the reference's serial per-video loop,
``run_TStar_onDataset.py:195-205``).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tstar_tpu.parallel.batched import run_search_batched_chained
from tstar_tpu.parallel.mesh import DATA_AXIS
from tstar_tpu.search.detector_scorer import OwlVitScorer, make_owlvit_scorer
from tstar_tpu.search.state import init_state
from tstar_tpu.utils.config import SearchConfig
from tstar_tpu.video.cache import build_frame_cache

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class VideoTask:
    video_path: str
    target_objects: List[str]
    cue_objects: List[str]
    seed: int = 0


def search_videos(
    tasks: Sequence[VideoTask],
    heuristic,
    config: Optional[SearchConfig] = None,
    mesh=None,
) -> List[Dict]:
    """Search all videos to completion in one batched on-device loop.

    The heuristic must produce ``OwlVitScorer``-shaped scorers (shared
    detector weights; per-video caches/prompts).  Returns one dict per video:
    {"keyframe_timestamps", "keyframe_secs", "remaining_targets",
     "iterations"}.
    """
    config = config or SearchConfig()
    caches = [build_frame_cache(t.video_path, config) for t in tasks]
    n_pad = max(c.n_pad for c in caches)

    scorers, states = [], []
    for task, cache in zip(tasks, caches):
        frames = cache.frames
        if cache.n_pad < n_pad:
            frames = jnp.pad(
                frames, ((0, n_pad - cache.n_pad), (0, 0), (0, 0), (0, 0))
            )
        scorer = heuristic.build_scorer(
            frames, task.target_objects, task.cue_objects, config
        )
        if not isinstance(scorer, OwlVitScorer):
            raise TypeError(
                f"batched search requires an OwlVitScorer-shaped backend, got "
                f"{type(scorer).__name__}"
            )
        scorers.append(scorer)
        states.append(
            init_state(
                cache.n_valid, len(task.target_objects), config,
                jax.random.key(task.seed), n_pad=n_pad,
            )
        )

    batched_scorer = OwlVitScorer(
        cache=jnp.stack([s.cache for s in scorers]),
        variables=scorers[0].variables,           # shared weights
        query_embeds=jnp.stack([s.query_embeds for s in scorers]),
        query_mask=jnp.stack([s.query_mask for s in scorers]),
        class_weights=jnp.stack([s.class_weights for s in scorers]),
        model=scorers[0].model,
        config=config,
    )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def dp_put(x):
            return jax.device_put(
                x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
            )

        stacked = jax.tree_util.tree_map(dp_put, stacked)
        batched_scorer = dataclasses.replace(
            batched_scorer,
            cache=dp_put(batched_scorer.cache),
            query_embeds=dp_put(batched_scorer.query_embeds),
            query_mask=dp_put(batched_scorer.query_mask),
            class_weights=dp_put(batched_scorer.class_weights),
        )

    max_iters = max(config.iteration_cap(c.n_valid) for c in caches)
    finals, secs = run_search_batched_chained(
        stacked, batched_scorer, config, max_iterations=max_iters
    )
    secs = np.asarray(secs)
    remaining = np.asarray(finals.remaining)
    iterations = np.asarray(finals.iteration)
    final_p = np.asarray(finals.P)

    results = []
    for i, (task, cache) in enumerate(zip(tasks, caches)):
        ts = sorted(float(s) / config.sampling_fps for s in secs[i])
        left = [
            t for j, t in enumerate(task.target_objects) if remaining[i, j]
        ]
        results.append(
            {
                "video_path": task.video_path,
                "keyframe_timestamps": ts,
                "keyframe_secs": secs[i].tolist(),
                "keyframe_distribution": final_p[i, : cache.n_valid].tolist(),
                "remaining_targets": left,
                "iterations": int(iterations[i]),
            }
        )
    return results
