"""Temporal warm start (FlowConfig.temporal_init): each frame pair's
coarsest level is seeded with the previous pair's flow — cv2's
OPTFLOW_USE_INITIAL_FLOW chained over time (the per-pair flag itself is
parity-tested against cv2 in test_farneback.py). A shallow pyramid that
cannot reach a large steady motion cold CAN track it warm, because after
the first pairs the residual per pair is near zero.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kalman_hydra_tpu import pipeline as pl
from kalman_hydra_tpu.config import (EkfConfig, FlowConfig, RunConfig,
                                     TrackConfig)
from kalman_hydra_tpu.io.synthetic import _textured_background


# per-pair x-shifts: start within a 2-level pyramid's cold reach, then
# ACCELERATE to 9 px/frame (far beyond it) — the regime temporal chaining
# is for: each pair's residual vs the previous pair's flow stays small
_SHIFTS = np.float32([1.5, 3.0, 4.5, 6.0, 7.5, 9.0, 9.0])


def _accel_shift_clip(height=96, width=96, seed=0):
    """Whole-frame rigid translation by _SHIFTS[t] px in x between frames
    t and t+1 (every pixel moves; truth flow per pair is constant)."""
    rng = np.random.default_rng(seed)
    offs = np.concatenate([[0.0], np.cumsum(_SHIFTS)])
    pad = int(np.ceil(offs[-1])) + 2
    big = _textured_background(height + 2 * pad, width + 2 * pad, rng) * 255
    frames = np.empty((len(offs), height, width), np.float32)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    for t, off in enumerate(offs):
        ys, xs = yy + pad, xx + pad - off
        iy, ix = np.floor(ys).astype(int), np.floor(xs).astype(int)
        fy, fx = ys - iy, xs - ix
        frames[t] = (big[iy, ix] * (1 - fx) * (1 - fy)
                     + big[iy, ix + 1] * fx * (1 - fy)
                     + big[iy + 1, ix] * (1 - fx) * fy
                     + big[iy + 1, ix + 1] * fx * fy)
    return np.clip(frames, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def shift_clip():
    return _accel_shift_clip()


def _seq_epe_fast_pairs(frames, cfg):
    flows = np.asarray(pl.flow_sequence(jnp.asarray(frames),
                                        RunConfig(flow=cfg)))
    # score the >= 6 px/frame pairs (beyond the shallow pyramid's reach)
    es = [np.linalg.norm(flows[t] - [s, 0.0], axis=-1)[8:-8, 8:-8].mean()
          for t, s in enumerate(_SHIFTS) if s >= 6.0]
    return float(np.mean(es))


def test_temporal_init_extends_shallow_pyramid_reach(shift_clip):
    cold = _seq_epe_fast_pairs(shift_clip, FlowConfig(levels=2))
    warm = _seq_epe_fast_pairs(shift_clip,
                               FlowConfig(levels=2, temporal_init=True))
    # accelerating past a 2-level pyramid's reach: cold collapses, the
    # warm chain rides along
    assert cold > 2.0, cold
    assert warm < 0.15, warm


def test_temporal_init_tracking_and_stream_parity(shift_clip):
    # CA-6 dynamics: the clip accelerates at 1.5 px/frame^2 (a CV filter
    # structurally lags it)
    cfg = RunConfig(flow=FlowConfig(levels=2, temporal_init=True),
                    ekf=EkfConfig(measurement="position", q=0.5,
                                  state_dim=6),
                    tracks=TrackConfig(num_tracks=8, corner_pool=16,
                                       reinit=False))
    seeds = np.stack(np.meshgrid(np.linspace(20, 40, 3)[:1],
                                 np.linspace(24, 72, 8)),
                     axis=-1).reshape(-1, 2)[:8].astype(np.float32)
    tr = pl.track_clip(shift_clip, cfg, seeds=seeds)
    # tracked displacement from frame 2 to the end follows the truth
    d = tr.positions[-1, :, 0] - tr.positions[2, :, 0]
    assert np.median(d) == pytest.approx(float(_SHIFTS[2:].sum()), abs=1.5)
    # streaming driver produces the identical trajectory
    tr_s = pl.track_stream(iter(shift_clip[1:]), cfg, frame0=shift_clip[0],
                           seeds=seeds)
    np.testing.assert_allclose(tr_s.positions, tr.positions, atol=1e-5)


def test_temporal_init_checkpoint_resume_bit_identical(shift_clip, tmp_path):
    cfg = RunConfig(flow=FlowConfig(levels=2, temporal_init=True),
                    ekf=EkfConfig(measurement="position", q=0.5),
                    tracks=TrackConfig(num_tracks=8, corner_pool=16,
                                       reinit=False))
    ck = str(tmp_path / "ck.npz")
    full = pl.track_stream(iter(shift_clip[1:]), cfg, frame0=shift_clip[0])
    # write a checkpoint mid-stream, then resume and compare the tail
    pl.track_stream(iter(shift_clip[1:5]), cfg, frame0=shift_clip[0],
                    checkpoint_path=ck, checkpoint_every=4)
    tr2 = pl.track_stream(iter(shift_clip), cfg, checkpoint_path=ck,
                          resume=True)
    np.testing.assert_array_equal(tr2.positions[-1], full.positions[-1])


def test_temporal_init_validation():
    with pytest.raises(ValueError, match="temporal_init"):
        FlowConfig(method="lk_dense", temporal_init=True)
    cfg = RunConfig(flow=FlowConfig(temporal_init=True))
    assert RunConfig.from_json(cfg.to_json()) == cfg
