"""tstar_tpu — a TPU-native JAX framework for T* keyframe search in long videos.

A ground-up, TPU-first rebuild of the T* temporal-search framework
(reference: mll-lab-nu/TStar; paper arXiv 2504.02259).  Given a long video and
a question, it (1) grounds the question into target/cue objects with a VLM,
(2) searches the video with an iterative, detection-guided temporal sampler
that runs as an on-device ``lax.while_loop`` over an HBM-resident 1-fps frame
cache, and (3) answers the question from the selected keyframes with a VLM.

Public API parity (reference ``TStar/TStarFramework.py:21,190``):

    from tstar_tpu import TStarFramework, run_tstar
"""

__version__ = "0.1.0"

from tstar_tpu.utils.config import SearchConfig, FrameworkConfig  # noqa: F401


def __getattr__(name):
    # Lazy: the framework layer pulls in the model/grounding stack, which is
    # not needed by users of the bare search engine / ops.
    if name in ("TStarFramework", "run_tstar"):
        from tstar_tpu.framework import framework as _fw

        return getattr(_fw, name)
    if name in ("KeyframeSearcher", "TStarSearcher"):
        from tstar_tpu.search import searcher as _s

        return getattr(_s, name)
    if name in ("search_videos", "VideoTask"):
        from tstar_tpu.parallel import multi_video as _mv

        return getattr(_mv, name)
    if name in ("UniversalGrounder", "TStarUniversalGrounder"):
        from tstar_tpu.grounding import universal as _g

        return getattr(_g, name)
    if name == "initialize_heuristic":
        from tstar_tpu.framework.heuristics import initialize_heuristic

        return initialize_heuristic
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
