"""Checkpoint / resume for streaming tracking (SURVEY.md §5).

The entire pipeline state is one small pytree — (TrackState, prev_gray,
frame_idx) — so plain compressed npz is sufficient (flax/orbax would be
overkill for a few MB of filter state; keep deps minimal per SURVEY.md §5).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..models.ekf import TrackState


def save_state(path: str, state: TrackState, prev_gray: np.ndarray,
               frame_idx: int) -> None:
    np.savez_compressed(
        path,
        x=np.asarray(state.x), P=np.asarray(state.P),
        alive=np.asarray(state.alive), misses=np.asarray(state.misses),
        track_id=np.asarray(state.track_id),
        prev_gray=np.asarray(prev_gray),
        frame_idx=np.int64(frame_idx))


def load_state(path: str) -> Tuple[TrackState, np.ndarray, int]:
    with np.load(path) as z:
        state = TrackState(
            x=z["x"], P=z["P"], alive=z["alive"],
            misses=z["misses"], track_id=z["track_id"])
        return state, z["prev_gray"], int(z["frame_idx"])
