"""Rauch-Tung-Striebel smoother, batched over tracks (BASELINE.json:11).

Backward `lax.scan` over the stacked filter outputs (SURVEY.md §3.4):
  C_t = P_t F^T (P-_{t+1})^-1
  x_s = x_t + C (x_s_{t+1} - x-_{t+1})
  P_s = P_t + C (P_s_{t+1} - P-_{t+1}) C^T
The n x n inverse is done via Cholesky solve (n = 4 or 6). For long clips
the caller chunks time and feeds the chunk-boundary smoothed pair in as the
init (SURVEY.md §5 "long-context": chunked smoothing with host offload).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_PREC = jax.lax.Precision.HIGHEST


def _chol_solve_spd(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B for batched SPD (K, n, n) A against (K, n, m) B."""
    L = jnp.linalg.cholesky(A)
    W = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), W, lower=False)


def rts_smooth(F: jnp.ndarray,
               x_filt: jnp.ndarray, P_filt: jnp.ndarray,
               x_pred: jnp.ndarray, P_pred: jnp.ndarray,
               init: Tuple[jnp.ndarray, jnp.ndarray] = None,
               breaks: jnp.ndarray = None):
    """Smooth a (T, K, n) filtered trajectory.

    x_pred[t] / P_pred[t] are the one-step predictions *for* frame t.
    `init` optionally provides (x_s, P_s) at the step after the last frame
    of this chunk (for chunked smoothing); defaults to the final filtered
    state. `breaks` ((T-1, K) bool, aligned with the smoothed steps) marks
    track-segment boundaries (re-seed / death between t and t+1): the
    recursion restarts from the filtered state there instead of smoothing
    across the discontinuity. Returns (x_smooth, P_smooth).
    """
    T = x_filt.shape[0]
    if init is None:
        xs_last, Ps_last = x_filt[-1], P_filt[-1]
        x_f, P_f = x_filt[:-1], P_filt[:-1]
        x_p, P_p = x_pred[1:], P_pred[1:]
    else:
        xs_last, Ps_last = init
        x_f, P_f = x_filt, P_filt
        # caller must pass predictions aligned one past each filtered step
        x_p, P_p = x_pred, P_pred
    if breaks is None:
        breaks = jnp.zeros(x_f.shape[:2], dtype=bool)

    def body(carry, inp):
        xs_next, Ps_next = carry
        xf, Pf, xp, Pp, brk = inp
        # C = Pf F^T Pp^-1  ==  solve(Pp, F Pf^T)^T
        FPf = jnp.einsum("ij,kjl->kil", F, Pf, precision=_PREC)   # (K, n, n)
        C = jnp.swapaxes(_chol_solve_spd(Pp, FPf), -1, -2)
        xs = xf + jnp.einsum("kij,kj->ki", C, xs_next - xp, precision=_PREC)
        dP = Ps_next - Pp
        Ps = Pf + jnp.einsum("kij,kjl,kml->kim", C, dP, C, precision=_PREC)
        Ps = 0.5 * (Ps + jnp.swapaxes(Ps, -1, -2))
        xs = jnp.where(brk[:, None], xf, xs)
        Ps = jnp.where(brk[:, None, None], Pf, Ps)
        return (xs, Ps), (xs, Ps)

    (_, _), (xs_rev, Ps_rev) = lax.scan(
        body, (xs_last, Ps_last), (x_f, P_f, x_p, P_p, breaks),
        reverse=True)
    if init is None:
        xs = jnp.concatenate([xs_rev, xs_last[None]], axis=0)
        Ps = jnp.concatenate([Ps_rev, Ps_last[None]], axis=0)
    else:
        xs, Ps = xs_rev, Ps_rev
    return xs, Ps


def rts_smooth_chunked(F, x_filt, P_filt, x_pred, P_pred, chunk: int,
                       breaks=None):
    """Host-chunked RTS for long horizons (SURVEY.md §3.4 memory plan).

    Inputs are HOST arrays (T, K, ...); the device holds one `chunk` of
    history at a time — O(chunk) device memory instead of O(T). The
    smoothed boundary state threads between chunks, so the result equals
    the monolithic `rts_smooth` exactly. `breaks` ((T-1, K) bool, row t =
    segment boundary between frames t and t+1) restarts the recursion at
    re-seeds/deaths exactly as in `rts_smooth`.
    """
    import numpy as np
    import jax

    T = x_filt.shape[0]
    F_d = jnp.asarray(F)
    xs_out = np.empty_like(np.asarray(x_filt))
    Ps_out = np.empty_like(np.asarray(P_filt))
    xs_out[-1] = x_filt[-1]
    Ps_out[-1] = P_filt[-1]
    init = (jnp.asarray(x_filt[-1]), jnp.asarray(P_filt[-1]))

    hi = T - 1
    while hi > 0:
        lo = max(0, hi - chunk)
        # smooth frames [lo, hi): needs predictions for [lo+1, hi]
        xs_c, Ps_c = rts_smooth(
            F_d,
            jnp.asarray(x_filt[lo:hi]), jnp.asarray(P_filt[lo:hi]),
            jnp.asarray(x_pred[lo + 1:hi + 1]),
            jnp.asarray(P_pred[lo + 1:hi + 1]),
            init=init,
            breaks=(jnp.asarray(breaks[lo:hi])
                    if breaks is not None else None))
        xs_out[lo:hi] = np.asarray(xs_c)
        Ps_out[lo:hi] = np.asarray(Ps_c)
        init = (xs_c[0], Ps_c[0])
        hi = lo
    return xs_out, Ps_out


def fixed_lag_smooth(F: jnp.ndarray,
                     xf: jnp.ndarray, Pf: jnp.ndarray,
                     xp: jnp.ndarray, Pp: jnp.ndarray,
                     tid: jnp.ndarray, alive: jnp.ndarray):
    """Online fixed-lag smoothing step (SURVEY.md §5 long-context).

    Inputs are the (L+1)-deep state window carried by the pipeline,
    oldest first: xf/Pf filtered states, xp/Pp the one-step predictions
    FOR each window step, tid/alive the (L+1, K) lifecycle fields used to
    derive segment breaks (re-seeds / deaths restart the recursion, same
    semantics as the full RTS in pipeline.track_arrays). Returns the
    smoothed (x, P) of the OLDEST window entry — the frame leaving the
    window this step. Memory is O(L) in clip length; only (K, n) leaves
    per frame, which is what makes streaming smoothing viable on hosts
    where device->host bandwidth is the constraint.
    """
    breaks = (tid[1:] != tid[:-1]) | ~alive[1:] | ~alive[:-1]
    xs, Ps = rts_smooth(F, xf, Pf, xp, Pp, breaks=breaks)
    return xs[0], Ps[0]
