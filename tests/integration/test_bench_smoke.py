"""Benchmark harness smoke (SURVEY.md §4.6: each bench config runs at
reduced size in CI mode). Runs bench.py's core measurement paths on the
CPU backend with tiny shapes — validates the harness plumbing (config
construction, repeat-differencing timing, EPE stage) without a TPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


@pytest.fixture(autouse=True)
def _force_xla_impl(monkeypatch):
    # skip the Mosaic hardware probe: CPU backend, XLA path
    monkeypatch.setenv("KH_IMPL", "xla")
    monkeypatch.setenv("KH_FAST_WARP", "4")


def test_bench_fused_pipeline_smoke():
    import bench
    fps, extra = bench.bench_fused_pipeline(64, 64, t=4, num_tracks=16,
                                            state_dim=4,
                                            flow_method="farneback",
                                            repeats=2)
    assert np.isfinite(fps) and fps > 0
    assert extra["fps_median_of"] == 2
    assert extra["fps_spread_pct"] >= 0


def test_bench_epe_smoke():
    import bench
    epe = bench.bench_epe(64, 64)
    # the accuracy contract at bench scale (BASELINE.json:5: < 0.5 px)
    assert np.isfinite(epe) and epe < 0.5
