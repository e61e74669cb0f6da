"""Perf-claim drift enforcement (VERDICT r2 item 5, r1 task 9 reopened).

Every tracked numeric claim in README.md must match the newest
BENCH_r*.json within tolerance; a tracked claim that disappears is also a
failure.  The manifest lives in scripts/check_doc_claims.py.  When a new
round's bench legitimately moves a number past tolerance, this test goes
red until the doc is regenerated — that is the enforcement working, and
the fix is a one-line doc edit.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_checker():
    spec = importlib.util.spec_from_file_location(
        "check_doc_claims", os.path.join(REPO, "scripts", "check_doc_claims.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_readme_claims_match_latest_bench():
    mod = _load_checker()
    bench_path, failures = mod.check(verbose=False)
    assert not failures, (
        f"doc drift vs {os.path.basename(bench_path)}:\n" + "\n".join(failures)
    )


def test_coverage_carries_no_raw_perf_numbers():
    """COVERAGE.md must point at BENCH_r*.json/README, not carry copies of
    bench numbers that can go stale (the r1/r2 drift incidents both lived
    here)."""
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    import re

    hits = re.findall(r"\b\d[\d,.]*\s*(?:frames?/s(?:ec)?|f/s)\b", text)
    assert not hits, f"raw throughput figures in COVERAGE.md: {hits}"
