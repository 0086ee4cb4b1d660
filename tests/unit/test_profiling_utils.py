"""Profiling/cost utilities (SURVEY.md §5 tracing)."""

import os

import jax.numpy as jnp

from kalman_hydra_tpu.utils.profiling import cost, timed, trace


def test_cost_analysis_reports_flops():
    def f(a, b):
        return a @ b
    out = cost(f, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert "cost" in out and "memory" in out
    flops = out["cost"].get("flops") if isinstance(out["cost"], dict) else None
    if flops is not None:
        assert flops >= 2 * 64 ** 3 * 0.5


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert os.path.isdir(d) and os.listdir(d)


def test_timed_reports(capsys):
    with timed("op"):
        pass
    assert "op:" in capsys.readouterr().out
