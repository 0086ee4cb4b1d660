"""Track lifecycle: NIS gating, occlusion handling, corner-pool re-init.

BASELINE.json:11 "occlusion-gated track re-init" under jit constraints:
fixed-capacity pool + masks, never shape changes (SURVEY.md §7). A track
whose normalized innovation squared exceeds the chi^2 gate is "missed"
(its update is rolled back to the prediction); after `max_misses`
consecutive misses it dies and is re-seeded from the strongest corner-pool
candidate not too close to any living track.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import EkfConfig, TrackConfig
from . import dynamics
from .ekf import TrackState


def gate(state: TrackState, x_pred, P_pred, nis, cfg: EkfConfig) -> TrackState:
    """Apply the NIS chi^2 gate: gated tracks keep the prediction and
    accumulate misses; passing tracks reset the miss counter."""
    missed = state.alive & (nis > cfg.gate_chi2)
    x = jnp.where(missed[:, None], x_pred, state.x)
    P = jnp.where(missed[:, None, None], P_pred, state.P)
    misses = jnp.where(missed, state.misses + 1,
                       jnp.where(state.alive, 0, state.misses))
    return state._replace(x=x, P=P, misses=misses)


def kill_lost(state: TrackState, cfg: EkfConfig,
              height: int, width: int) -> TrackState:
    """Kill tracks that exceeded max_misses or left the frame."""
    pos = state.x[:, 0:2]
    inb = ((pos[:, 0] >= 0) & (pos[:, 0] <= width - 1)
           & (pos[:, 1] >= 0) & (pos[:, 1] <= height - 1))
    alive = state.alive & (state.misses < cfg.max_misses) & inb
    return state._replace(alive=alive)


def reseed(state: TrackState, corner_pts: jnp.ndarray,
           corner_score: jnp.ndarray, ekf_cfg: EkfConfig,
           trk_cfg: TrackConfig) -> TrackState:
    """Re-seed dead slots from the per-frame corner pool.

    Static-shape greedy assignment: candidate corners are scored, corners
    within min_distance of any LIVING track are suppressed, and the top
    dead-slot-count survivors fill dead slots in score order. Uses one
    (K_pool x K_tracks) distance matrix — small (e.g. 512 x 1024).
    """
    K = state.x.shape[0]
    pos = state.x[:, 0:2]                          # (K, 2)
    d2 = jnp.sum((corner_pts[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    near_live = jnp.any((d2 < trk_cfg.min_distance ** 2)
                        & state.alive[None, :], axis=1)
    cand_score = jnp.where((corner_score > 0) & ~near_live,
                           corner_score, -jnp.inf)        # (P,)

    dead = ~state.alive
    n_dead = jnp.sum(dead)
    # rank candidates and dead slots; candidate i fills the i-th dead slot
    P_pool = cand_score.shape[0]
    order = jnp.argsort(-cand_score)                       # best first
    cand_rank = jnp.zeros(P_pool, jnp.int32).at[order].set(
        jnp.arange(P_pool, dtype=jnp.int32))
    # dead slots numbered 0..n_dead-1 in index order
    dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1    # (K,)
    # for each track slot: which candidate (by rank) would fill it
    take = jnp.clip(dead_rank, 0, P_pool - 1)
    cand_idx = order[take]                                 # (K,)
    new_pos = corner_pts[cand_idx]                         # (K, 2)
    ok = dead & (dead_rank < jnp.sum(jnp.isfinite(cand_score))) \
        & jnp.isfinite(cand_score[cand_idx])

    n = ekf_cfg.state_dim
    x_seed = jnp.zeros((K, n), jnp.float32).at[:, 0:2].set(new_pos)
    P0 = jnp.asarray(dynamics.initial_covariance(ekf_cfg))
    x = jnp.where(ok[:, None], x_seed, state.x)
    P = jnp.where(ok[:, None, None], P0[None], state.P)
    alive = state.alive | ok
    misses = jnp.where(ok, 0, state.misses)
    track_id = jnp.where(ok, state.track_id + 1, state.track_id)
    state = state._replace(x=x, P=P, alive=alive, misses=misses,
                           track_id=track_id)
    if state.q_scale is not None:
        # adaptive process noise restarts at 1 for the fresh track
        state = state._replace(q_scale=jnp.where(ok, 1.0, state.q_scale))
    return state
