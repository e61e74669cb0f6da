"""Auxiliary subsystems: snapshot/resume, profiling, pipeline script sanity."""

import os
import subprocess

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tstar_tpu.search.engine import run_search, search_step
from tstar_tpu.search.scorers import TableScorer
from tstar_tpu.search.snapshot import load_state, save_state
from tstar_tpu.search.state import init_state
from tstar_tpu.utils.config import SearchConfig
from tstar_tpu.utils.profiling import MetricsLogger, StageTimer

from tests.oracle import make_synthetic_tables

CFG = SearchConfig(search_budget=1.0)


def _scorer(n_pad, n_valid, seed=5):
    t = make_synthetic_tables(n_pad, n_valid, CFG.max_objects, 1, seed)
    return TableScorer(
        grid_conf=jnp.asarray(t.grid_conf),
        grid_presence=jnp.asarray(t.grid_presence),
        verify_conf=jnp.asarray(t.verify_conf),
        verify_presence=jnp.asarray(t.verify_presence),
    )


class TestSnapshotResume:
    def test_resume_continues_exact_trajectory(self, tmp_path):
        n_valid, n_pad = 200, 256
        scorer = _scorer(n_pad, n_valid)
        s0 = init_state(n_valid, 1, CFG, jax.random.key(0), n_pad=n_pad)

        # uninterrupted run
        full, secs_full = jax.jit(run_search, static_argnums=2)(s0, scorer, CFG)

        # run 2 steps, snapshot, reload, continue
        step = jax.jit(search_step, static_argnums=2)
        s = s0
        for _ in range(2):
            s, _ = step(s, scorer, CFG)
        path = str(tmp_path / "state.npz")
        save_state(s, path)
        resumed = load_state(path)
        final, secs = jax.jit(run_search, static_argnums=2)(resumed, scorer, CFG)

        np.testing.assert_array_equal(np.asarray(secs), np.asarray(secs_full))
        np.testing.assert_allclose(
            np.asarray(final.scores), np.asarray(full.scores), rtol=1e-6
        )
        assert int(final.iteration) == int(full.iteration)

    def test_roundtrip_fields(self, tmp_path):
        s0 = init_state(100, 2, CFG, jax.random.key(7), n_pad=128)
        path = str(tmp_path / "s.npz")
        save_state(s0, path)
        s1 = load_state(path)
        for name in ("scores", "visited", "P", "remaining", "budget", "n_valid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(s0, name)), np.asarray(getattr(s1, name))
            )


class TestProfiling:
    def test_stage_timer_accumulates(self):
        t = StageTimer()
        with t.stage("decode"):
            pass
        with t.stage("decode"):
            pass
        with t.stage("search"):
            pass
        rep = t.report()
        assert rep["decode"]["count"] == 2
        assert rep["search"]["count"] == 1
        assert rep["decode"]["total_s"] >= 0

    def test_metrics_logger_jsonl(self, tmp_path):
        import json

        path = str(tmp_path / "m.jsonl")
        log = MetricsLogger(path)
        log.log({"metric": "x", "value": 1})
        log.log({"metric": "y", "value": 2})
        rows = [json.loads(l) for l in open(path)]
        assert len(rows) == 2 and rows[0]["metric"] == "x" and "ts" in rows[0]

    def test_metrics_logger_disabled(self):
        MetricsLogger(None).log({"a": 1})  # no-op, no crash


class TestPipelineScript:
    def test_script_is_valid_bash(self):
        script = os.path.join(
            os.path.dirname(__file__), "..", "scripts", "eval_lv_haystack.sh"
        )
        out = subprocess.run(["bash", "-n", script], capture_output=True)
        assert out.returncode == 0, out.stderr.decode()
