"""End-to-end pipeline parity: device pipeline vs CPU oracle on synthetic
clips (SURVEY.md §4.3, BASELINE.json:7 config-1 pattern)."""

import numpy as np
import pytest

from kalman_hydra_tpu import api
from kalman_hydra_tpu import pipeline as pl
from kalman_hydra_tpu.config import (EkfConfig, FlowConfig, RunConfig,
                                     SmoothConfig, TrackConfig)
from kalman_hydra_tpu.io.synthetic import moving_blob_clip
from kalman_hydra_tpu.ref import pipeline as rp


@pytest.fixture(scope="module")
def clip96():
    return moving_blob_clip(num_frames=6, height=96, width=96,
                            num_points=8, seed=0)


@pytest.fixture(scope="module")
def cfg96():
    return RunConfig(flow=FlowConfig(levels=3),
                     tracks=TrackConfig(num_tracks=8, reinit=False))


def test_device_pipeline_matches_oracle(clip96, cfg96):
    frames, truth = clip96
    seeds = truth.positions[0]
    tr = pl.track_clip(frames, cfg96, seeds=seeds)
    ref = rp.track_clip(frames, cfg96, seeds=seeds)
    d = np.linalg.norm(tr.positions - ref.positions, axis=-1)
    assert d.mean() < 1e-3        # way under the 0.5px contract
    assert d.max() < 1e-2


def test_device_pipeline_tracks_truth(clip96, cfg96):
    frames, truth = clip96
    tr = pl.track_clip(frames, cfg96, seeds=truth.positions[0])
    err = np.linalg.norm(tr.positions[-1] - truth.positions[-1], axis=-1)
    assert err.mean() < 3.5       # dead-reckoning lag bound (matches oracle)


def test_streaming_matches_clip_mode(clip96, cfg96):
    frames, truth = clip96
    cfg = cfg96.replace(tracks=TrackConfig(num_tracks=8, reinit=True,
                                           corner_pool=32))
    tr_clip = pl.track_clip(frames, cfg)
    tr_stream = pl.track_stream(iter(frames), cfg)
    assert np.allclose(tr_clip.positions, tr_stream.positions, atol=1e-4)
    assert np.array_equal(tr_clip.alive, tr_stream.alive)


def test_streaming_matches_clip_mode_init_velocity(clip96, cfg96):
    """Regression: track_stream silently ignored tracks.init_velocity,
    so streaming and clip runs of the same config diverged through the
    dead-reckoning transient."""
    frames, truth = clip96
    cfg = cfg96.replace(tracks=TrackConfig(num_tracks=8, reinit=True,
                                           corner_pool=32,
                                           init_velocity=True))
    tr_clip = pl.track_clip(frames, cfg)
    tr_stream = pl.track_stream(iter(frames), cfg)
    assert np.allclose(tr_clip.positions, tr_stream.positions, atol=1e-4)
    assert np.array_equal(tr_clip.alive, tr_stream.alive)


def test_full_pipeline_with_lifecycle_and_smoothing(clip96):
    frames, _ = clip96
    cfg = RunConfig(flow=FlowConfig(levels=3),
                    ekf=EkfConfig(state_dim=6),
                    tracks=TrackConfig(num_tracks=16, corner_pool=64),
                    smooth=SmoothConfig(enabled=True))
    tr = pl.track_clip(frames, cfg, with_history=True)
    assert tr.positions.shape == (6, 16, 2)
    assert tr.smoothed is not None
    assert tr.smoothed.shape == (6, 16, 2)
    assert np.isfinite(tr.smoothed).all()
    # smoothed track should deviate from filtered by a bounded amount
    live = tr.alive.all(axis=0)
    if live.any():
        dd = np.linalg.norm(tr.smoothed[:, live] - tr.positions[:, live],
                            axis=-1)
        assert dd.max() < 10.0


def test_api_track_video_roundtrip(tmp_path, clip96):
    frames, _ = clip96
    cfg = RunConfig(flow=FlowConfig(levels=3),
                    tracks=TrackConfig(num_tracks=8, corner_pool=32))
    out = str(tmp_path / "tracks.npz")
    tr = api.track_video(frames, cfg, out_path=out)
    from kalman_hydra_tpu.io.export import load
    tr2 = load(out)
    assert np.array_equal(tr.positions, tr2.positions)


def test_api_flow_matches_oracle(trans_pair):
    a, b, _ = trans_pair
    a8 = np.round(a).astype(np.uint8)
    b8 = np.round(b).astype(np.uint8)
    cfg = FlowConfig()
    got = api.flow(a8, b8, cfg)
    from kalman_hydra_tpu.ref import imgproc as ip
    ref = ip.farneback(a8, b8, cfg)
    epe = np.linalg.norm(got - ref, axis=-1)
    assert epe.mean() < 0.05


def test_api_flow_accepts_color_frames(trans_pair):
    """api.flow on (H, W, 3) uint8 frames grayscales internally — the CLI
    `flow` command feeds decoded color frames straight through (regression:
    used to crash in the pyramid on the trailing channel dim)."""
    a, b, shift = trans_pair
    a8 = np.round(a).astype(np.uint8)
    b8 = np.round(b).astype(np.uint8)
    a3 = np.stack([a8, a8, a8], axis=-1)
    b3 = np.stack([b8, b8, b8], axis=-1)
    got = api.flow(a3, b3, FlowConfig())
    ref = api.flow(a8, b8, FlowConfig())
    assert np.allclose(got, ref, atol=1e-5)


def test_api_flow_normalized_float_color_frames(trans_pair):
    """[0, 1]-normalized float color frames must yield real flow
    (regression: the int32 fixed-point gray path truncated them to
    all-black and the det regularizer then returned silently-zero
    flow)."""
    a, b, shift = trans_pair
    a3 = (np.stack([a, a, a], axis=-1) / 255.0).astype(np.float32)
    b3 = (np.stack([b, b, b], axis=-1) / 255.0).astype(np.float32)
    got = api.flow(a3, b3, FlowConfig())
    true_fl = np.asarray(shift)
    err = np.abs(got[8:-8, 8:-8] - true_fl[8:-8, 8:-8]).mean()
    assert err < 0.3, err


def test_implicit_flow_ekf_runs(clip96):
    frames, truth = clip96
    cfg = RunConfig(flow=FlowConfig(levels=3),
                    ekf=EkfConfig(measurement="implicit_flow", iekf_iters=2),
                    tracks=TrackConfig(num_tracks=8, reinit=False))
    tr = pl.track_clip(frames, cfg, seeds=truth.positions[0])
    err = np.linalg.norm(tr.positions[-1] - truth.positions[-1], axis=-1)
    assert np.isfinite(tr.positions).all()
    assert err.mean() < 4.0


def test_flow_sequence_with_pixel_smoothing(clip96):
    frames, truth = clip96
    from kalman_hydra_tpu import api
    cfg = RunConfig(flow=FlowConfig(levels=3))
    flows = api.flow_sequence(frames, cfg, smooth=True)
    assert flows.shape == (5, 96, 96, 2)
    # blob moves ~(1.7, -1.1): flow at the blob center should be close
    c = truth.positions[2].mean(axis=0).astype(int)
    v = flows[2, c[1], c[0]]
    assert np.abs(v - truth.velocity[2]).max() < 0.5


def test_seed_in_body_restricts_to_mask(clip96):
    frames, truth = clip96
    cfg = RunConfig(flow=FlowConfig(levels=3),
                    tracks=TrackConfig(num_tracks=8, corner_pool=32,
                                       seed_in_body=True))
    tr = pl.track_clip(frames, cfg)
    import jax.numpy as jnp
    from kalman_hydra_tpu.ops.color import grayscale_u8
    from kalman_hydra_tpu.ops.segment import segment_body
    mask = np.asarray(segment_body(grayscale_u8(jnp.asarray(frames[0]))))
    p0 = tr.positions[0][tr.alive[0]]
    ys = np.clip(p0[:, 1].round().astype(int), 0, mask.shape[0] - 1)
    xs = np.clip(p0[:, 0].round().astype(int), 0, mask.shape[1] - 1)
    assert mask[ys, xs].mean() > 0.8


def test_track_precomputed_flow_matches_online(clip96, cfg96):
    frames, truth = clip96
    from kalman_hydra_tpu import api
    flows = api.flow_sequence(frames, cfg96)
    seeds = truth.positions[0].astype(np.float32)
    tr_pre = pl.track_precomputed_flow(flows, seeds, cfg96)
    tr_on = pl.track_clip(frames, cfg96, seeds=seeds)
    np.testing.assert_allclose(tr_pre.positions, tr_on.positions, atol=1e-4)


def test_flow_to_rgb_visualization():
    from kalman_hydra_tpu.io.overlay import flow_to_rgb
    flow = np.zeros((16, 16, 2), np.float32)
    flow[:8, :, 0] = 2.0     # rightward
    flow[8:, 1] = 0.0
    rgb = flow_to_rgb(flow)
    assert rgb.shape == (16, 16, 3)
    assert rgb.dtype == np.uint8
    assert (rgb[:8] != rgb[8:]).any()   # moving half colored differently


def test_implicit_flow_agrees_with_position_on_smooth_field(clip96):
    """On a smooth flow field the EKF (implicit measurement) and the
    linear-KF position model must agree closely; the EKF's flow-Jacobian
    only matters near sharp flow gradients."""
    frames, truth = clip96
    seeds = truth.positions[0]
    base = RunConfig(flow=FlowConfig(levels=3),
                     tracks=TrackConfig(num_tracks=8, reinit=False))
    tr_kf = pl.track_clip(frames, base, seeds=seeds)
    tr_ekf = pl.track_clip(
        frames, base.replace(ekf=EkfConfig(measurement="implicit_flow")),
        seeds=seeds)
    d = np.linalg.norm(tr_kf.positions - tr_ekf.positions, axis=-1)
    assert d.mean() < 0.5


def test_init_velocity_primes_filter(clip96):
    """init_velocity seeds track velocity from the first flow field.

    On this clip the dominant tracking error is flow dilution at the small
    blob's rim (identical in the oracle), so the win is modest — assert
    the priming happens and never hurts."""
    frames, truth = clip96
    seeds = truth.positions[0]
    cold = pl.track_clip(frames, RunConfig(
        flow=FlowConfig(levels=3),
        tracks=TrackConfig(num_tracks=8, reinit=False)), seeds=seeds)
    warm = pl.track_clip(frames, RunConfig(
        flow=FlowConfig(levels=3),
        tracks=TrackConfig(num_tracks=8, reinit=False,
                           init_velocity=True)), seeds=seeds)
    err_cold = np.linalg.norm(cold.positions[-1] - truth.positions[-1],
                              axis=-1).mean()
    err_warm = np.linalg.norm(warm.positions[-1] - truth.positions[-1],
                              axis=-1).mean()
    assert err_warm <= err_cold + 1e-3
    # the first post-init step must differ (velocity actually primed)
    assert not np.allclose(cold.positions[1], warm.positions[1])


def test_reinit_every_matches_behavior(clip96):
    """Pool caching (reinit_every) must keep re-seeding functional."""
    frames, _ = clip96
    cfg_every = RunConfig(flow=FlowConfig(levels=3),
                          tracks=TrackConfig(num_tracks=16, corner_pool=64,
                                             reinit_every=3))
    tr = pl.track_clip(frames, cfg_every)
    assert np.isfinite(tr.positions).all()
    assert tr.alive[-1].mean() > 0.5
    # frame-1 behavior identical to per-frame refresh (pool refreshed at 0)
    cfg_one = RunConfig(flow=FlowConfig(levels=3),
                        tracks=TrackConfig(num_tracks=16, corner_pool=64))
    tr1 = pl.track_clip(frames, cfg_one)
    assert tr.positions.shape == tr1.positions.shape


def test_lk_sparse_pipeline_mode(clip96):
    """Sparse pyrLK pipeline mode (with the cached prev pyramid in the
    scan carry) must track comparably to the dense-flow mode."""
    frames, truth = clip96
    seeds = truth.positions[0]
    cfg = RunConfig(flow=FlowConfig(method="lk_sparse", levels=3),
                    tracks=TrackConfig(num_tracks=8, reinit=False))
    tr = pl.track_clip(frames, cfg, seeds=seeds)
    assert np.isfinite(tr.positions).all()
    err = np.linalg.norm(tr.positions[-1] - truth.positions[-1], axis=-1)
    assert err.mean() < 3.5
