"""Trajectory export (SURVEY.md §2.1 #8: "writers for tracked trajectories").

Formats: compressed .npz (canonical, round-trips everything) and .csv
(long format: frame, track, x, y, alive) for external tooling.
"""

from __future__ import annotations

import csv
import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Trajectories:
    """Result of tracking one clip.

    positions : (T, K, 2) float32 — (x, y) per frame per track slot
    alive     : (T, K) bool — slot holds a live track this frame
    nis       : (T, K) float32 — per-update normalized innovation squared
    track_id  : (T, K) int32 — generation id (increments on re-seed)
    smoothed  : optional (T, K, 2) RTS-smoothed positions
    """

    positions: np.ndarray
    alive: np.ndarray
    nis: Optional[np.ndarray] = None
    track_id: Optional[np.ndarray] = None
    smoothed: Optional[np.ndarray] = None

    @property
    def num_frames(self) -> int:
        return self.positions.shape[0]

    @property
    def num_tracks(self) -> int:
        return self.positions.shape[1]


def save(tracks: Trajectories, path: str) -> None:
    if path.endswith(".csv"):
        _save_csv(tracks, path)
        return
    payload = {"positions": tracks.positions, "alive": tracks.alive}
    for name in ("nis", "track_id", "smoothed"):
        v = getattr(tracks, name)
        if v is not None:
            payload[name] = v
    np.savez_compressed(path, **payload)


def load(path: str) -> Trajectories:
    with np.load(path) as z:
        return Trajectories(
            positions=z["positions"],
            alive=z["alive"],
            nis=z["nis"] if "nis" in z else None,
            track_id=z["track_id"] if "track_id" in z else None,
            smoothed=z["smoothed"] if "smoothed" in z else None,
        )


def _save_csv(tracks: Trajectories, path: str) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["frame", "track", "x", "y", "alive"])
        T, K = tracks.alive.shape
        for t in range(T):
            for k in range(K):
                w.writerow([
                    t, k,
                    f"{tracks.positions[t, k, 0]:.4f}",
                    f"{tracks.positions[t, k, 1]:.4f}",
                    int(tracks.alive[t, k]),
                ])
