"""Fault injection (SURVEY.md §5 "failure detection"): corrupt frames /
teleporting content must trip the NIS gate and re-init, not corrupt state.
BASELINE.json:11's occlusion-gated re-init is the in-algorithm fault
tolerance being exercised."""

import numpy as np
import pytest

from kalman_hydra_tpu import pipeline as pl
from kalman_hydra_tpu.config import (EkfConfig, FlowConfig, RunConfig,
                                     TrackConfig)
from kalman_hydra_tpu.io.synthetic import moving_blob_clip
from kalman_hydra_tpu.utils.report import run_report


@pytest.fixture(scope="module")
def corrupted_clip():
    frames, truth = moving_blob_clip(num_frames=10, height=96, width=96,
                                     num_points=8, seed=4)
    bad = frames.copy()
    # frame 5: content teleports back to frame 0 (~10 px) — the flow field
    # reports a large wrong displacement, a classic dropout/glitch
    bad[5] = frames[0]
    return frames, bad, truth


def test_gate_absorbs_corrupted_frame(corrupted_clip):
    frames, bad, truth = corrupted_clip
    cfg = RunConfig(flow=FlowConfig(levels=3),
                    ekf=EkfConfig(gate_chi2=9.21, max_misses=3),
                    tracks=TrackConfig(num_tracks=8, reinit=False))
    seeds = truth.positions[0]
    clean = pl.track_clip(frames, cfg, seeds=seeds)
    faulty = pl.track_clip(bad, cfg, seeds=seeds)
    # the corrupt frame must register as gated (high NIS) for most tracks
    assert (faulty.nis[5] > cfg.ekf.gate_chi2).mean() > 0.5
    # after recovery (few frames later) positions should be close to the
    # clean run again — the gate coasted the filter over the glitch
    err_end = np.linalg.norm(faulty.positions[-1] - clean.positions[-1],
                             axis=-1)
    assert np.median(err_end) < 4.0


def test_reseed_recovers_dead_tracks(corrupted_clip):
    frames, bad, _ = corrupted_clip
    cfg = RunConfig(flow=FlowConfig(levels=3),
                    ekf=EkfConfig(gate_chi2=6.0, max_misses=1),
                    tracks=TrackConfig(num_tracks=16, corner_pool=64,
                                       reinit=True))
    tr = pl.track_clip(bad, cfg)
    rep = run_report(tr)
    # corruption kills tracks; re-seeding must bring the pool back up
    assert rep["live_fraction_last"] > 0.5
    assert rep["reseeds_total"] >= 1
    # every re-seeded slot restarts from a real corner inside the frame
    assert np.isfinite(tr.positions).all()


def test_report_shapes(corrupted_clip):
    frames, _, truth = corrupted_clip
    cfg = RunConfig(flow=FlowConfig(levels=3),
                    tracks=TrackConfig(num_tracks=8, reinit=False))
    tr = pl.track_clip(frames, cfg, seeds=truth.positions[0])
    rep = run_report(tr, wall_seconds=1.0)
    assert rep["frames"] == 10
    assert "nis_hist" in rep and "fps" in rep


def test_checked_update_catches_bad_covariance():
    import jax.numpy as jnp
    from kalman_hydra_tpu.utils.debug import checked_update
    x = jnp.zeros((2, 4))
    P = jnp.broadcast_to(-jnp.eye(4), (2, 4, 4))   # corrupt: negative P
    y = jnp.zeros((2, 2))
    H = jnp.zeros((2, 4)).at[0, 0].set(1.0).at[1, 1].set(1.0)
    R = 0.25 * jnp.eye(2)
    err, _ = checked_update(x, P, y, H, R)
    with pytest.raises(Exception):
        err.throw()


def test_overlay_renderer(corrupted_clip, tmp_path):
    frames, _, truth = corrupted_clip
    cfg = RunConfig(flow=FlowConfig(levels=3),
                    tracks=TrackConfig(num_tracks=8, reinit=False))
    tr = pl.track_clip(frames, cfg, seeds=truth.positions[0])
    from kalman_hydra_tpu.io.overlay import render_overlay, write_overlay
    ann = render_overlay(frames, tr)
    assert ann.shape == frames.shape
    assert (ann != frames).any()          # something was drawn
    write_overlay(str(tmp_path / "overlay.npz"), frames, tr)


def test_duplicated_frame_is_benign(corrupted_clip):
    """A dropped/duplicated frame (zero flow) must not destabilize the
    filter: tracks coast on the prediction and recover."""
    frames, _, truth = corrupted_clip
    dup = frames.copy()
    dup[5] = dup[4]                     # frame drop -> duplicate
    cfg = RunConfig(flow=FlowConfig(levels=3),
                    tracks=TrackConfig(num_tracks=8, reinit=False))
    tr = pl.track_clip(dup, cfg, seeds=truth.positions[0])
    assert np.isfinite(tr.positions).all()
    clean = pl.track_clip(frames, cfg, seeds=truth.positions[0])
    err = np.linalg.norm(tr.positions[-1] - clean.positions[-1], axis=-1)
    assert np.median(err) < 3.0


def test_all_black_frames_do_not_crash():
    """Degenerate input (no texture at all): everything gated/killed but
    no NaNs and no crash (checkify-style robustness, SURVEY.md §5)."""
    frames = np.zeros((5, 64, 64, 3), np.uint8)
    cfg = RunConfig(flow=FlowConfig(levels=2),
                    tracks=TrackConfig(num_tracks=8, corner_pool=16))
    tr = pl.track_clip(frames, cfg)
    assert np.isfinite(tr.positions).all()


def test_nis_hist_bins_align_with_labels():
    """Regression: the histogram labels were shifted one bin (the [0,0.5)
    count vanished and outliers landed under '<50')."""
    import numpy as np
    from kalman_hydra_tpu.io.export import Trajectories
    T, K = 2, 6
    nis = np.array([[0.1, 0.7, 1.5, 3.0, 5.0, 100.0]] * T, np.float32)
    tr = Trajectories(positions=np.zeros((T, K, 2), np.float32),
                      alive=np.ones((T, K), bool), nis=nis,
                      track_id=np.zeros((T, K), np.int32), smoothed=None)
    h = run_report(tr)["nis_hist"]
    assert h["<0.5"] == 2 and h["<1"] == 2 and h["<2"] == 2
    assert h["<4"] == 2 and h["<9.21"] == 2
    assert h["<50"] == 0 and h["<inf"] == 2
