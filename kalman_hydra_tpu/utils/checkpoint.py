"""Checkpoint / resume for streaming tracking (SURVEY.md §5).

The entire pipeline state is one small pytree — (TrackState, prev_gray,
frame_idx, corner cache) — so plain compressed npz is sufficient
(flax/orbax would be overkill for a few MB of filter state; keep deps
minimal per SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..models.ekf import TrackState


def save_state(path: str, state: TrackState, prev_gray: np.ndarray,
               frame_idx: int, corner_cache: Tuple = ()) -> None:
    extra = {}
    if corner_cache:
        extra["corner_pts"] = np.asarray(corner_cache[0])
        extra["corner_score"] = np.asarray(corner_cache[1])
    if state.q_scale is not None:
        extra["q_scale"] = np.asarray(state.q_scale)
    np.savez_compressed(
        path,
        x=np.asarray(state.x), P=np.asarray(state.P),
        alive=np.asarray(state.alive), misses=np.asarray(state.misses),
        track_id=np.asarray(state.track_id),
        prev_gray=np.asarray(prev_gray),
        frame_idx=np.int64(frame_idx), **extra)


def load_state(path: str) -> Tuple[TrackState, np.ndarray, int,
                                   Optional[Tuple]]:
    with np.load(path) as z:
        state = TrackState(
            x=z["x"], P=z["P"], alive=z["alive"],
            misses=z["misses"], track_id=z["track_id"],
            q_scale=z["q_scale"] if "q_scale" in z else None)
        corner_cache = None
        if "corner_pts" in z:
            corner_cache = (z["corner_pts"], z["corner_score"])
        return state, z["prev_gray"], int(z["frame_idx"]), corner_cache
