"""Photometric measurement channel (models/photometric.py).

The render-residual observation analog (SURVEY.md §2.1 #3/#4): template
patch + Gauss-Newton alignment as an EKF measurement with per-track
covariance. Parity vs the NumPy twin; tracking through a flow-field
dropout where flow-only tracking fails.
"""

import numpy as np
import jax.numpy as jnp

from kalman_hydra_tpu import pipeline as pl
from kalman_hydra_tpu.config import (EkfConfig, FlowConfig, RunConfig,
                                     TrackConfig)
from kalman_hydra_tpu.io.synthetic import moving_blob_clip, translating_pair
from kalman_hydra_tpu.models.photometric import (photometric_measure,
                                                 photometric_measure_np)


def test_photometric_measure_matches_numpy_twin():
    a, b, _ = translating_pair(height=96, width=96, shift=(1.6, -0.9))
    cfg = EkfConfig()
    rng = np.random.default_rng(0)
    p_prev = rng.uniform(20, 70, size=(24, 2)).astype(np.float32)
    # predicted positions near (but not at) the true displaced location
    p_pred = p_prev + np.array([1.2, -0.5], np.float32)

    z_np, R_np, v_np = photometric_measure_np(a, b, p_prev, p_pred, cfg)
    z_j, R_j, v_j = photometric_measure(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(p_prev),
        jnp.asarray(p_pred), cfg)
    np.testing.assert_allclose(np.asarray(z_j), z_np, atol=2e-2)
    np.testing.assert_allclose(np.asarray(R_j), R_np, rtol=5e-2, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(v_j), v_np)
    # GN should land on the true shift from the perturbed prediction
    np.testing.assert_allclose(z_np[v_np], (p_prev + [1.6, -0.9])[v_np],
                               atol=0.15)


def test_photometric_tracking_matches_truth():
    frames, truth = moving_blob_clip(num_frames=8, height=96, width=96,
                                     num_points=8, blob_sigma=14.0,
                                     velocity=(1.4, -0.9), seed=4)
    cfg = RunConfig(ekf=EkfConfig(measurement="photometric"),
                    tracks=TrackConfig(num_tracks=8, reinit=False))
    tr = pl.track_clip(frames, cfg, seeds=truth.positions[0])
    err = np.linalg.norm(tr.positions[-1] - truth.positions[-1], axis=-1)
    assert float(np.median(err)) < 0.5


def test_photometric_survives_flow_dropout():
    """Zero the dense flow for the middle frames: the flow-only filter
    stalls and ends with a large error; the photometric channel (which
    reads the frames) keeps tracking (VERDICT round-1 item 6)."""
    frames, truth = moving_blob_clip(num_frames=10, height=96, width=96,
                                     num_points=8, blob_sigma=14.0,
                                     velocity=(2.0, -1.3), seed=6)
    seeds = truth.positions[0]
    fcfg = RunConfig(flow=FlowConfig(levels=2),
                     tracks=TrackConfig(num_tracks=8, reinit=False),
                     ekf=EkfConfig(measurement="position", q=0.01))
    flows = np.asarray(pl.flow_sequence(
        jnp.asarray(frames), fcfg))
    flows_dropped = flows.copy()
    flows_dropped[2:7] = 0.0   # 5-frame flow dropout

    flow_tr = pl.track_precomputed_flow(flows_dropped, seeds, fcfg)
    pcfg = RunConfig(ekf=EkfConfig(measurement="photometric"),
                     tracks=TrackConfig(num_tracks=8, reinit=False))
    photo_tr = pl.track_clip(frames, pcfg, seeds=seeds)

    flow_err = np.median(np.linalg.norm(
        flow_tr.positions[-1] - truth.positions[-1], axis=-1))
    photo_err = np.median(np.linalg.norm(
        photo_tr.positions[-1] - truth.positions[-1], axis=-1))
    assert photo_err < 0.5
    assert flow_err > 2.0 * photo_err + 1.0


def test_flow_photometric_combined_channel():
    frames, truth = moving_blob_clip(num_frames=8, height=96, width=96,
                                     num_points=8, blob_sigma=14.0,
                                     velocity=(1.4, -0.9), seed=4)
    cfg = RunConfig(flow=FlowConfig(levels=2),
                    ekf=EkfConfig(measurement="flow_photometric"),
                    tracks=TrackConfig(num_tracks=8, reinit=False))
    tr = pl.track_clip(frames, cfg, seeds=truth.positions[0])
    err = np.linalg.norm(tr.positions[-1] - truth.positions[-1], axis=-1)
    assert float(np.median(err)) < 0.5
