"""Estimation models: batched KF/EKF/IEKF core, RTS smoother, track
lifecycle (gating + re-init)."""
from . import dynamics, lifecycle, rts
from .ekf import TrackState, ekf_step, init_tracks, predict, update

__all__ = ["dynamics", "lifecycle", "rts", "TrackState", "ekf_step",
           "init_tracks", "predict", "update"]
