"""XLA Farneback vs cv2.calcOpticalFlowFarneback (the core parity target,
BASELINE.json:5 "<0.5px mean endpoint error vs reference")."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from kalman_hydra_tpu.config import FlowConfig
from kalman_hydra_tpu.ops import farneback as FB
from kalman_hydra_tpu.ref import imgproc as ip


@pytest.fixture(scope="module")
def pair128():
    from kalman_hydra_tpu.io.synthetic import translating_pair
    a, b, ft = translating_pair(height=128, width=128, shift=(3.0, -2.0),
                                seed=0)
    return np.round(a).astype(np.uint8), np.round(b).astype(np.uint8), ft


def _run(a, b, cfg):
    f = jax.jit(lambda x, y: FB.farneback(x, y, cfg))
    return np.asarray(f(jnp.asarray(a.astype(np.float32)),
                        jnp.asarray(b.astype(np.float32))))


def test_farneback_matches_cv2_box(pair128):
    a, b, _ = pair128
    cfg = FlowConfig()
    got = _run(a, b, cfg)
    ref = ip.farneback(a, b, cfg)
    epe = np.linalg.norm(got - ref, axis=-1)
    assert epe[8:-8, 8:-8].mean() < 0.01
    assert epe.mean() < 0.05          # full field incl. borders
    assert epe.max() < 0.5            # hard contract everywhere


def test_farneback_matches_cv2_gaussian(pair128):
    a, b, _ = pair128
    cfg = FlowConfig(gaussian_win=True)
    got = _run(a, b, cfg)
    ref = ip.farneback(a, b, cfg)
    epe = np.linalg.norm(got - ref, axis=-1)
    assert epe[8:-8, 8:-8].mean() < 0.01
    assert epe.mean() < 0.05


def test_farneback_tracks_truth(pair128):
    a, b, ft = pair128
    got = _run(a, b, FlowConfig())
    epe = np.linalg.norm(got - ft, axis=-1)[8:-8, 8:-8]
    assert epe.mean() < 0.05


def test_farneback_poly7(pair128):
    a, b, _ = pair128
    cfg = FlowConfig(poly_n=7, poly_sigma=1.5)
    got = _run(a, b, cfg)
    ref = ip.farneback(a, b, cfg)
    epe = np.linalg.norm(got - ref, axis=-1)
    assert epe[8:-8, 8:-8].mean() < 0.02


def test_farneback_level_clamp_small_image():
    """OpenCV clamps pyramid depth so levels >= 32px; a 48px image with
    levels=5 must still agree (exercises the min_size plan)."""
    from kalman_hydra_tpu.io.synthetic import translating_pair
    a, b, _ = translating_pair(height=48, width=48, shift=(1.0, 0.5), seed=2)
    a = np.round(a).astype(np.uint8)
    b = np.round(b).astype(np.uint8)
    cfg = FlowConfig(levels=5)
    got = _run(a, b, cfg)
    ref = ip.farneback(a, b, cfg)
    epe = np.linalg.norm(got - ref, axis=-1)
    assert epe[6:-6, 6:-6].mean() < 0.02


def test_farneback_initial_flow(pair128):
    a, b, _ = pair128
    cfg = FlowConfig(iterations=1, levels=1)
    init = np.broadcast_to(np.array([3.0, -2.0], np.float32),
                           (128, 128, 2)).copy()
    f = jax.jit(lambda x, y, f0: FB.farneback(x, y, cfg, flow0=f0))
    got = np.asarray(f(jnp.asarray(a.astype(np.float32)),
                       jnp.asarray(b.astype(np.float32)),
                       jnp.asarray(init)))
    # seeded with the right answer + 1 iteration -> should stay close
    err = np.linalg.norm(got - init, axis=-1)[8:-8, 8:-8]
    assert err.mean() < 0.2


def test_farneback_initial_flow_matches_cv2_flag(pair128):
    """flow0 warm start vs cv2.OPTFLOW_USE_INITIAL_FLOW: both seed the
    coarsest pyramid level from the supplied field (cv2 resizes with
    INTER_AREA, we resize linearly — the refinement iterations absorb the
    difference; parity holds at the usual interior tolerance)."""
    a, b, _ = pair128
    a8, b8 = np.round(a).astype(np.uint8), np.round(b).astype(np.uint8)
    cfg = FlowConfig(levels=3, iterations=2)
    rng = np.random.default_rng(0)
    init = (np.broadcast_to(np.float32([3.0, -2.0]), (128, 128, 2))
            + rng.normal(0, 0.4, (128, 128, 2))).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda x, y, f0: FB.farneback(x, y, cfg, flow0=f0))(
            jnp.asarray(a.astype(np.float32)),
            jnp.asarray(b.astype(np.float32)), jnp.asarray(init)))
    ref = ip.farneback(a8, b8, cfg, flow0=init.copy())
    epe = np.linalg.norm(got - ref, axis=-1)
    assert epe[8:-8, 8:-8].mean() < 0.05
    # and the warm start actually helps: closer to truth than a cold
    # 3-level run of the same iteration budget is to its own init
    err_true = np.linalg.norm(got - [3.0, -2.0], axis=-1)[8:-8, 8:-8]
    assert err_true.mean() < 0.05


def test_fast_warp_matches_exact(pair128):
    """Select-sum warp vs the exact gather warp: sub-1e-2 px flow EPE."""
    a, b, _ = pair128
    cfg = FlowConfig()
    fast = FlowConfig(fast_warp=8)
    exact = _run(a, b, cfg)
    got = _run(a, b, fast)
    epe = np.linalg.norm(got - exact, axis=-1)
    assert epe.mean() < 0.01
    assert epe[8:-8, 8:-8].max() < 0.05
    # and still matches cv2 within the contract
    ref = ip.farneback(a, b, cfg)
    epe2 = np.linalg.norm(got - ref, axis=-1)
    assert epe2.mean() < 0.05


def test_bf16_poly_within_contract(pair128):
    a, b, _ = pair128
    ref = ip.farneback(a, b, FlowConfig())
    for fw in (0, 8):
        got = _run(a, b, FlowConfig(bf16_poly=True, fast_warp=fw))
        epe = np.linalg.norm(got - ref, axis=-1)
        assert epe.mean() < 0.05
        assert epe[8:-8, 8:-8].mean() < 0.01


def test_fast_warp_with_gaussian_window(pair128):
    a, b, _ = pair128
    ref = ip.farneback(a, b, FlowConfig(gaussian_win=True))
    got = _run(a, b, FlowConfig(gaussian_win=True, fast_warp=8,
                                bf16_poly=True))
    epe = np.linalg.norm(got - ref, axis=-1)
    assert epe.mean() < 0.05


@pytest.mark.parametrize("kw", [
    dict(winsize=21),
    dict(levels=2),
    dict(pyr_scale=0.8, levels=3),
    dict(winsize=9, iterations=5),
])
def test_farneback_parameter_corners(pair128, kw):
    """Parity must hold across the parameter surface, not just defaults."""
    a, b, _ = pair128
    cfg = FlowConfig(**kw)
    got = _run(a, b, cfg)
    ref = ip.farneback(a, b, cfg)
    epe = np.linalg.norm(got - ref, axis=-1)
    assert epe[8:-8, 8:-8].mean() < 0.02
    assert epe.mean() < 0.08
