"""Per-pixel flow KF (BASELINE config 2) vs a scalar NumPy reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from kalman_hydra_tpu.models import pixel_ekf as pe


def _numpy_reference(zs, p):
    """Textbook 2-state KF on one scalar sequence."""
    F = np.array([[1.0, p.dt], [0.0, 1.0]])
    Q = p.q * np.array([[p.dt ** 3 / 3, p.dt ** 2 / 2],
                        [p.dt ** 2 / 2, p.dt]])
    H = np.array([[1.0, 0.0]])
    x = np.array([zs[0], 0.0])
    P = np.diag([p.p0, p.p0_rate])
    out = [zs[0]]
    for z in zs[1:]:
        x = F @ x
        P = F @ P @ F.T + Q
        y = z - x[0]
        s = P[0, 0] + p.r
        if y * y / s < p.gate:
            K = P[:, 0] / s
            x = x + K * y
            IKH = np.eye(2) - np.outer(K, H[0])
            P = IKH @ P @ IKH.T + np.outer(K, K) * p.r
        out.append(x[0])
    return np.array(out)


def test_matches_scalar_reference(rng):
    p = pe.PixelEkfParams()
    T, H, W = 12, 4, 5
    flows = rng.normal(size=(T, H, W, 2)).astype(np.float32)
    got = np.asarray(pe.smooth_flow_sequence(jnp.asarray(flows), p))
    for (i, j, c) in [(0, 0, 0), (2, 3, 1), (3, 1, 0)]:
        ref = _numpy_reference(flows[:, i, j, c].astype(np.float64), p)
        np.testing.assert_allclose(got[:, i, j, c], ref, atol=1e-4)


def test_smooths_noise_tracks_ramp(rng):
    p = pe.PixelEkfParams(q=0.01, r=0.5)
    T, H, W = 40, 8, 8
    t = np.arange(T, dtype=np.float32)
    truth = np.stack([0.1 * t, -0.05 * t], axis=-1)[:, None, None, :]
    truth = np.broadcast_to(truth, (T, H, W, 2))
    noisy = truth + rng.normal(0, 0.7, size=(T, H, W, 2)).astype(np.float32)
    got = np.asarray(pe.smooth_flow_sequence(jnp.asarray(noisy), p))
    raw_err = np.abs(noisy[25:] - truth[25:]).mean()
    kf_err = np.abs(got[25:] - truth[25:]).mean()
    assert kf_err < raw_err * 0.6


def test_gate_rejects_outliers(rng):
    p = pe.PixelEkfParams(q=0.01, r=0.1)
    T = 20
    flows = np.zeros((T, 2, 2, 2), np.float32)
    flows[10, 0, 0, 0] = 50.0       # single-frame glitch
    got = np.asarray(pe.smooth_flow_sequence(jnp.asarray(flows), p))
    assert abs(got[10, 0, 0, 0]) < 1.0       # glitch coasted over
    assert abs(got[-1].max()) < 0.5
