"""Chunked / streaming RTS smoothing (SURVEY.md §3.4 + §5 long-context).

SmoothConfig.chunk > 0 selects the host-chunked smoother in `track_clip`;
`track_stream` offloads filter history per frame and smooths afterwards —
O(chunk) device memory in clip length. Both must match the monolithic
on-device RTS.
"""

import numpy as np
import pytest

from kalman_hydra_tpu import pipeline as pl
from kalman_hydra_tpu.config import (FlowConfig, RunConfig, SmoothConfig,
                                     TrackConfig)
from kalman_hydra_tpu.io.synthetic import moving_blob_clip


def _cfg(chunk=0):
    return RunConfig(flow=FlowConfig(levels=2),
                     tracks=TrackConfig(num_tracks=8, corner_pool=16),
                     smooth=SmoothConfig(enabled=True, chunk=chunk))


def test_chunked_track_clip_matches_monolithic():
    frames, _ = moving_blob_clip(num_frames=20, height=64, width=64, seed=2)
    mono = pl.track_clip(frames, _cfg(chunk=0))
    chunked = pl.track_clip(frames, _cfg(chunk=6))
    assert mono.smoothed is not None and chunked.smoothed is not None
    np.testing.assert_allclose(chunked.smoothed, mono.smoothed, atol=1e-4)
    np.testing.assert_allclose(chunked.positions, mono.positions, atol=1e-4)


@pytest.mark.slow
def test_streaming_smoothing_long_horizon():
    """T=500 streaming clip smooths with O(chunk) device memory and
    matches the monolithic on-device RTS (VERDICT round-1 item 4)."""
    frames, _ = moving_blob_clip(num_frames=500, height=64, width=64, seed=7)
    mono = pl.track_clip(frames, _cfg(chunk=0))
    streamed = pl.track_stream(iter(frames), _cfg(chunk=32))
    assert streamed.smoothed is not None
    assert streamed.smoothed.shape == mono.smoothed.shape
    np.testing.assert_allclose(streamed.smoothed, mono.smoothed, atol=1e-4)


def test_streaming_smoothing_short():
    frames, _ = moving_blob_clip(num_frames=12, height=64, width=64, seed=3)
    mono = pl.track_clip(frames, _cfg(chunk=0))
    streamed = pl.track_stream(iter(frames), _cfg(chunk=4))
    assert streamed.smoothed is not None
    np.testing.assert_allclose(streamed.smoothed, mono.smoothed, atol=1e-4)


def _cfg_lag(lag):
    return RunConfig(flow=FlowConfig(levels=2),
                     tracks=TrackConfig(num_tracks=8, corner_pool=16),
                     smooth=SmoothConfig(enabled=True, lag=lag))


def test_fixed_lag_window_equals_rts_exactly():
    """With T = lag + 1 the online smoother's single full-window emission
    is literally the RTS on that window — exact agreement for frame 0."""
    lag = 7
    frames, _ = moving_blob_clip(num_frames=lag + 1, height=64, width=64,
                                 seed=4)
    mono = pl.track_clip(frames, _cfg(chunk=0))
    lagged = pl.track_stream(iter(frames), _cfg_lag(lag))
    assert lagged.smoothed is not None
    np.testing.assert_allclose(lagged.smoothed[0], mono.smoothed[0],
                               atol=1e-4)


def test_fixed_lag_streaming_approximates_full_rts():
    """Fixed-lag estimates converge to the full RTS as the window covers
    the informative future; with lag=8 on a smooth synthetic track the
    difference is far below a pixel everywhere."""
    frames, _ = moving_blob_clip(num_frames=24, height=64, width=64, seed=5)
    mono = pl.track_clip(frames, _cfg(chunk=0))
    lagged = pl.track_stream(iter(frames), _cfg_lag(8))
    assert lagged.smoothed is not None
    assert lagged.smoothed.shape == mono.smoothed.shape
    d = np.linalg.norm(lagged.smoothed - mono.smoothed, axis=-1)
    assert float(d.max()) < 0.05
    # the trailing window is flushed with a full in-window RTS: the last
    # lag+1 frames match the monolithic smoother exactly
    np.testing.assert_allclose(lagged.smoothed[-1], mono.smoothed[-1],
                               atol=1e-4)


def test_fixed_lag_emits_only_small_rows():
    """The lag path must not fetch filter history (that is its point:
    O(K) host traffic per frame on slow-D2H hosts)."""
    frames, _ = moving_blob_clip(num_frames=10, height=64, width=64, seed=6)
    lagged = pl.track_stream(iter(frames), _cfg_lag(4))
    assert lagged.smoothed is not None
    assert np.isfinite(lagged.smoothed).all()


def test_fixed_lag_clip_mode_matches_streaming():
    """track_clip with lag > 0 assembles the SAME smoothed trajectory the
    streaming driver produces (per-step emissions + final-window flush),
    without running a second full RTS."""
    frames, _ = moving_blob_clip(num_frames=16, height=64, width=64, seed=8)
    clip = pl.track_clip(frames, _cfg_lag(5))
    streamed = pl.track_stream(iter(frames), _cfg_lag(5))
    assert clip.smoothed is not None and streamed.smoothed is not None
    np.testing.assert_allclose(clip.smoothed, streamed.smoothed, atol=1e-4)


def test_fixed_lag_respects_enabled_flag():
    """lag > 0 with enabled=False must be a no-op (no lag window, no
    smoothed output)."""
    frames, _ = moving_blob_clip(num_frames=8, height=64, width=64, seed=9)
    cfg = RunConfig(flow=FlowConfig(levels=2),
                    tracks=TrackConfig(num_tracks=8, corner_pool=16),
                    smooth=SmoothConfig(enabled=False, lag=6))
    tr = pl.track_stream(iter(frames), cfg)
    assert tr.smoothed is None


def test_fixed_lag_clip_shorter_than_window():
    """T <= lag: every frame comes from the final-window flush slice —
    shapes and clip/stream agreement must hold (regression for the
    xs_tail[L+1-T:] index arithmetic)."""
    frames, _ = moving_blob_clip(num_frames=4, height=64, width=64, seed=10)
    clip = pl.track_clip(frames, _cfg_lag(6))
    streamed = pl.track_stream(iter(frames), _cfg_lag(6))
    assert clip.smoothed.shape == clip.positions.shape
    np.testing.assert_allclose(clip.smoothed, streamed.smoothed, atol=1e-4)


def test_fixed_lag_takes_precedence_over_chunk():
    """lag and chunk both set: BOTH drivers must pick the fixed-lag
    smoother (they used to diverge — clip took the chunked RTS)."""
    frames, _ = moving_blob_clip(num_frames=14, height=64, width=64,
                                 seed=11)
    cfg = RunConfig(flow=FlowConfig(levels=2),
                    tracks=TrackConfig(num_tracks=8, corner_pool=16),
                    smooth=SmoothConfig(enabled=True, lag=5, chunk=4))
    clip = pl.track_clip(frames, cfg)
    streamed = pl.track_stream(iter(frames), cfg)
    np.testing.assert_allclose(clip.smoothed, streamed.smoothed, atol=1e-4)
    # and the result is the LAG smoother's, not the chunked full RTS
    lag_only = pl.track_clip(frames, _cfg_lag(5))
    np.testing.assert_allclose(clip.smoothed, lag_only.smoothed, atol=1e-4)


def test_fixed_lag_survives_checkpoint_resume(tmp_path):
    """The smoother window is checkpointed (utils/checkpoint._LAG_KEYS),
    so resume is BIT-IDENTICAL to the uninterrupted stream — including
    the first `lag` smoothed rows after the resume point, which used to
    lean on a flat re-primed window (round-2 verdict item 6)."""
    frames, _ = moving_blob_clip(num_frames=18, height=64, width=64,
                                 seed=12)
    cfg = _cfg_lag(4)
    ck = str(tmp_path / "ck.npz")
    full = pl.track_stream(iter(frames), cfg)
    # run once writing checkpoints, then resume from the frame-8 one
    pl.track_stream(iter(frames[:9]), cfg, checkpoint_path=ck,
                    checkpoint_every=8)
    resumed = pl.track_stream(iter(frames), cfg, checkpoint_path=ck,
                              resume=True)
    assert resumed.smoothed is not None
    # resumed rows cover frames 9..17; EVERY row (positions and smoothed,
    # including those straddling the resume boundary) must match the
    # uninterrupted run exactly
    np.testing.assert_allclose(resumed.positions, full.positions[9:],
                               atol=1e-6)
    np.testing.assert_allclose(resumed.smoothed, full.smoothed[9:],
                               atol=1e-6)


def test_fixed_lag_resume_old_checkpoint_without_window(tmp_path):
    """Old checkpoints (no lag_* entries) still resume — falling back to
    the flat re-primed window — rather than erroring."""
    from kalman_hydra_tpu.utils import checkpoint as ckpt
    frames, _ = moving_blob_clip(num_frames=14, height=64, width=64,
                                 seed=13)
    cfg = _cfg_lag(3)
    ck = str(tmp_path / "old.npz")
    pl.track_stream(iter(frames[:8]), cfg, checkpoint_path=ck,
                    checkpoint_every=7)
    # strip the window entries to emulate a round-2 checkpoint
    state, prev_gray, idx, ccache, lbuf, _pflow = ckpt.load_state(ck)
    assert lbuf is not None
    ckpt.save_state(ck, state, prev_gray, idx, corner_cache=ccache or ())
    resumed = pl.track_stream(iter(frames), cfg, checkpoint_path=ck,
                              resume=True)
    assert resumed.smoothed is not None
    assert np.isfinite(resumed.smoothed).all()
