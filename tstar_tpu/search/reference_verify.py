"""Reference-fidelity verification: host raw-frame re-decode at 600x285.

The production engine rescores triggered frames from the HBM cache
(detector_scorer.score_verify).  The reference instead re-decodes the RAW
source frame and rescores it at 600x285 (``interface_searcher.py:401-405``)
— a different pixel chain whose removal decisions can drift from the
cache-resolution path.  This module runs the T* search with the reference's
exact verification fidelity so the two can be A/B'd
(scripts/verify_ab.py): the jitted step skips verification
(``apply_verification=False``) and the host replays the engine's
verification semantics (engine._apply_verification: rescore-overwrite +
at most one removal per frame, slot order, evolving remaining mask) on
raw decoded pixels.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tstar_tpu.search.engine import _continue, pop_frame_secs, search_step
from tstar_tpu.search.state import SearchState
from tstar_tpu.utils.config import SearchConfig

_step_noverify = jax.jit(search_step, static_argnums=(2, 3, 4))
_pop = jax.jit(pop_frame_secs, static_argnums=2)


def _verify_raw(scorer, pixels):
    return scorer.score_verify_raw(pixels)


_verify_raw_jit = jax.jit(_verify_raw)


def make_raw_frame_source(
    video_path: str, config: SearchConfig, raw_fps: Optional[float] = None
) -> Callable[[List[int]], np.ndarray]:
    """Frame source decoding RAW source frames resized to config.verify_hw
    (the reference chain: decord re-decode + cv2.resize (600, 285),
    interface_searcher.py:401-403).

    The returned callable owns an open decoder; call ``source.close()``
    (or use ``contextlib.closing``) when done to release it."""
    import cv2

    from tstar_tpu.video.decoder import open_video

    dec = open_video(video_path)
    fps = raw_fps or dec.meta.fps
    h, w = config.verify_hw

    def source(secs: List[int]) -> np.ndarray:
        idxs = [int(s / config.sampling_fps * fps) for s in secs]
        frames = dec.decode_batch(idxs)
        return np.stack(
            [cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR) for f in frames]
        )

    source.close = dec.close
    return source


def run_search_reference_verify(
    state: SearchState,
    scorer,
    config: SearchConfig,
    frame_source: Callable[[List[int]], np.ndarray],
    collect_decisions: bool = False,
) -> Tuple[SearchState, jax.Array, List[dict]]:
    """Host-stepped search with reference-fidelity verification.

    ``frame_source(secs)`` returns uint8 frames (K, h, w, 3) for the given
    sampled seconds; they are rescored on device via
    ``scorer.score_verify_raw``.  Returns (final state, keyframe secs,
    decision log [{iteration, sec, vconf, removed_slot} ...] when
    ``collect_decisions``).
    """
    t_max = config.max_targets
    decisions: List[dict] = []
    while bool(_continue(state)):
        state, aux = _step_noverify(state, scorer, config, False, False)
        secs = np.asarray(aux["secs"])
        pres = np.asarray(aux["presence"])[:, :t_max]
        remaining = np.asarray(state.remaining).copy()
        # superset of frames that can trigger (remaining only shrinks)
        cand = [k for k in range(len(secs)) if (pres[k] & remaining).any()]
        if cand:
            frames = frame_source([int(secs[k]) for k in cand])
            vconf, vpres = _verify_raw_jit(scorer, jnp.asarray(frames))
            vconf = np.asarray(vconf)
            vpres = np.asarray(vpres)[:, :t_max]
            scores = np.asarray(state.scores).copy()
            changed = False
            for i, k in enumerate(cand):
                in_cell = pres[k] & remaining
                if not in_cell.any():
                    continue   # earlier removal deactivated this trigger
                scores[int(secs[k])] = vconf[i]
                changed = True
                passing = (
                    in_cell & vpres[i] & (vconf[i] > config.confidence_threshold)
                )
                removed = None
                if passing.any():
                    removed = int(np.argmax(passing))
                    remaining[removed] = False
                if collect_decisions:
                    decisions.append({
                        "iteration": int(state.iteration),
                        "sec": int(secs[k]),
                        "vconf": float(vconf[i]),
                        "removed_slot": removed,
                    })
            if changed:
                state = state.replace(
                    scores=jnp.asarray(scores),
                    remaining=jnp.asarray(remaining),
                )
    rng, pop_key = jax.random.split(state.rng)
    state = state.replace(rng=rng)
    secs = _pop(state, pop_key, config)
    return state, secs, decisions
