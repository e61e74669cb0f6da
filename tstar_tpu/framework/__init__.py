from tstar_tpu.framework.framework import TStarFramework, run_tstar  # noqa: F401
from tstar_tpu.framework.heuristics import initialize_heuristic  # noqa: F401
