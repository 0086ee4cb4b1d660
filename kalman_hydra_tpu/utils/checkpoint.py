"""Checkpoint / resume for streaming tracking (SURVEY.md §5).

The entire pipeline state is one small pytree — (TrackState, prev_gray,
frame_idx, corner cache, fixed-lag smoother window) — so plain compressed
npz is sufficient (flax/orbax would be overkill for a few MB of filter
state; keep deps minimal per SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..models.ekf import TrackState

# fixed-lag window entries, in pipeline.Carry.lag_buf order
_LAG_KEYS = ("lag_xf", "lag_Pf", "lag_xp", "lag_Pp", "lag_tid", "lag_alive")


def save_state(path: str, state: TrackState, prev_gray: np.ndarray,
               frame_idx: int, corner_cache: Tuple = (),
               lag_buf: Tuple = (), prev_flow=None) -> None:
    extra = {}
    if corner_cache:
        extra["corner_pts"] = np.asarray(corner_cache[0])
        extra["corner_score"] = np.asarray(corner_cache[1])
    if prev_flow is not None:
        # temporal warm-start field (FlowConfig.temporal_init): without it
        # the first post-resume pair would cold-start and diverge from an
        # uninterrupted stream
        extra["prev_flow"] = np.asarray(prev_flow)
    if state.q_scale is not None:
        extra["q_scale"] = np.asarray(state.q_scale)
    if lag_buf:
        # the (lag+1)-deep smoother window ((lag+1, K, n[, n]) per entry):
        # serializing it makes resume BIT-IDENTICAL to an uninterrupted
        # stream — without it the first `lag` smoothed rows after resume
        # would lean on a flat re-primed window
        for k, a in zip(_LAG_KEYS, lag_buf):
            extra[k] = np.asarray(a)
    np.savez_compressed(
        path,
        x=np.asarray(state.x), P=np.asarray(state.P),
        alive=np.asarray(state.alive), misses=np.asarray(state.misses),
        track_id=np.asarray(state.track_id),
        prev_gray=np.asarray(prev_gray),
        frame_idx=np.int64(frame_idx), **extra)


def load_state(path: str) -> Tuple[TrackState, np.ndarray, int,
                                   Optional[Tuple], Optional[Tuple],
                                   Optional[np.ndarray]]:
    """Returns (state, prev_gray, frame_idx, corner_cache, lag_buf,
    prev_flow); the last three are None when absent from the file (old
    checkpoints)."""
    with np.load(path) as z:
        state = TrackState(
            x=z["x"], P=z["P"], alive=z["alive"],
            misses=z["misses"], track_id=z["track_id"],
            q_scale=z["q_scale"] if "q_scale" in z else None)
        corner_cache = None
        if "corner_pts" in z:
            corner_cache = (z["corner_pts"], z["corner_score"])
        lag_buf = None
        if _LAG_KEYS[0] in z:
            lag_buf = tuple(z[k] for k in _LAG_KEYS)
        prev_flow = z["prev_flow"] if "prev_flow" in z else None
        return state, z["prev_gray"], int(z["frame_idx"]), corner_cache, \
            lag_buf, prev_flow
