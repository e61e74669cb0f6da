from tstar_tpu.search.state import SearchState, init_state  # noqa: F401
from tstar_tpu.search.engine import (  # noqa: F401
    run_search,
    run_search_chained,
    run_search_with_history,
    sample_frame_secs,
    search_step,
    pop_frame_secs,
)
from tstar_tpu.search.scorers import TableScorer  # noqa: F401
from tstar_tpu.search.detector_scorer import OwlVitScorer, make_owlvit_scorer  # noqa: F401
