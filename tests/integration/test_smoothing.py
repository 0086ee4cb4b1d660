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
