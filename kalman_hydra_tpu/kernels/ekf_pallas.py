"""Pallas-TPU fused EKF kernel: predict + update for a track batch.

TPU-native replacement for the reference's CUDA estimation kernels
(SURVEY.md §2.1 #4 -> "batched small-matrix Pallas ops vmapped over
thousands of tracked points", BASELINE.json:5). Layout is structure-of-
arrays: the track axis K lives on the TPU lane dimension (128-wide), state
indices are unrolled Python loops — every matrix op becomes a VPU
elementwise op over K lanes, with zero gather/scatter.

The kernel fuses, per track: x<-Fx, P<-FPF^T+Q, S=HPH^T+R (2x2),
closed-form Cholesky solve, K=PH^T S^-1, Joseph covariance, NIS — one VMEM
round trip for the whole filter step instead of ~10 XLA kernels.

F, Q are config-static and baked into the kernel as Python constants.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _ekf_kernel(n: int, F: np.ndarray, Q: np.ndarray, r: float,
                x_ref, P_ref, y_ref, H_ref, xo_ref, Po_ref, nis_ref):
    """One grid step: a (state, TILE_K) slab of tracks.

    Refs: x (n, Tk), P (n*n, Tk), y (2, Tk), H (2*n, Tk).
    """
    x = [x_ref[i, :] for i in range(n)]
    P = [[P_ref[i * n + j, :] for j in range(n)] for i in range(n)]
    y = [y_ref[i, :] for i in range(2)]
    H = [[H_ref[i * n + j, :] for j in range(n)] for i in range(2)]

    # ---- predict: x = F x ; P = F P F^T + Q (F static -> unrolled) ----
    xp = []
    for i in range(n):
        acc = None
        for j in range(n):
            if F[i, j] == 0.0:
                continue
            term = x[j] if F[i, j] == 1.0 else F[i, j] * x[j]
            acc = term if acc is None else acc + term
        xp.append(acc)
    FP = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            acc = None
            for m in range(n):
                if F[i, m] == 0.0:
                    continue
                term = P[m][j] if F[i, m] == 1.0 else F[i, m] * P[m][j]
                acc = term if acc is None else acc + term
            FP[i][j] = acc
    Pp = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            acc = None
            for m in range(n):
                if F[j, m] == 0.0:
                    continue
                term = FP[i][m] if F[j, m] == 1.0 else F[j, m] * FP[i][m]
                acc = term if acc is None else acc + term
            Pp[i][j] = acc + Q[i, j] if Q[i, j] != 0.0 else acc

    # ---- innovation covariance S = H Pp H^T + R (2x2) ----
    PHt = [[None] * 2 for _ in range(n)]      # (n, 2)
    for i in range(n):
        for a in range(2):
            acc = None
            for j in range(n):
                term = Pp[i][j] * H[a][j]
                acc = term if acc is None else acc + term
            PHt[i][a] = acc
    S = [[None] * 2 for _ in range(2)]
    for a in range(2):
        for b in range(2):
            acc = None
            for j in range(n):
                term = H[a][j] * PHt[j][b]
                acc = term if acc is None else acc + term
            S[a][b] = acc + r if a == b else acc

    # ---- closed-form 2x2 Cholesky solve ----
    eps = jnp.float32(1e-12)
    l11 = jnp.sqrt(jnp.maximum(S[0][0], eps))
    l21 = S[1][0] / l11
    l22 = jnp.sqrt(jnp.maximum(S[1][1] - l21 * l21, eps))

    def solve(b0, b1):
        w1 = b0 / l11
        w2 = (b1 - l21 * w1) / l22
        z2 = w2 / l22
        z1 = (w1 - l21 * z2) / l11
        return z1, z2

    a0, a1 = solve(y[0], y[1])
    nis_ref[0, :] = y[0] * a0 + y[1] * a1

    Kg = [[None] * 2 for _ in range(n)]
    for i in range(n):
        Kg[i][0], Kg[i][1] = solve(PHt[i][0], PHt[i][1])

    # ---- state update ----
    for i in range(n):
        xo_ref[i, :] = xp[i] + Kg[i][0] * y[0] + Kg[i][1] * y[1]

    # ---- Joseph covariance: (I-KH) Pp (I-KH)^T + K R K^T ----
    IKH = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            kh = Kg[i][0] * H[0][j] + Kg[i][1] * H[1][j]
            IKH[i][j] = (1.0 - kh) if i == j else -kh
    AP = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            acc = None
            for m in range(n):
                term = IKH[i][m] * Pp[m][j]
                acc = term if acc is None else acc + term
            AP[i][j] = acc
    for i in range(n):
        for j in range(n):
            acc = None
            for m in range(n):
                term = AP[i][m] * IKH[j][m]
                acc = term if acc is None else acc + term
            acc = acc + r * (Kg[i][0] * Kg[j][0] + Kg[i][1] * Kg[j][1])
            Po_ref[i * n + j, :] = acc


@functools.partial(jax.jit,
                   static_argnames=("F_t", "Q_t", "r", "interpret"))
def _ekf_call(x_t, P_t, y_t, H_t, F_t, Q_t, r, interpret):
    n = x_t.shape[0]
    K = x_t.shape[1]
    F = np.asarray(F_t, dtype=np.float32)
    Q = np.asarray(Q_t, dtype=np.float32)
    TILE = min(512, K)
    grid = (K // TILE,)

    def spec(rows):
        return pl.BlockSpec((rows, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_ekf_kernel, n, F, Q, float(r))
    xo, Po, nis = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(n), spec(n * n), spec(2), spec(2 * n)],
        out_specs=(spec(n), spec(n * n), spec(1)),
        out_shape=(jax.ShapeDtypeStruct((n, K), jnp.float32),
                   jax.ShapeDtypeStruct((n * n, K), jnp.float32),
                   jax.ShapeDtypeStruct((1, K), jnp.float32)),
        interpret=interpret,
    )(x_t, P_t, y_t, H_t)
    return xo, Po, nis


def ekf_fused_step(x, P, y, H, F, Q, r, interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused predict+update. Same contract as models.ekf.predict followed
    by models.ekf.update.

    x (K, n), P (K, n, n), y (K, 2) residual vs the PREDICTED state,
    H (K, 2, n) or (2, n), F/Q (n, n) numpy (static), r scalar measurement
    noise variance (R = r I). Returns (x_post (K, n), P_post (K, n, n),
    nis (K,)).
    """
    K, n = x.shape
    Kp = _round_up(max(K, _LANES), _LANES)
    # _ekf_call tiles the lane axis with TILE = min(512, Kp); pad Kp up to a
    # multiple of that tile so the ceil-free grid covers every track (a
    # 128-padded count in (512, 1024) would otherwise lose its tail tile)
    Kp = _round_up(Kp, min(512, Kp))
    pad = Kp - K

    x_t = jnp.pad(x, ((0, pad), (0, 0))).T                       # (n, Kp)
    P_t = jnp.pad(P.reshape(K, n * n), ((0, pad), (0, 0))).T     # (n*n, Kp)
    y_t = jnp.pad(y, ((0, pad), (0, 0))).T                       # (2, Kp)
    if H.ndim == 2:
        H_t = jnp.broadcast_to(H.reshape(2 * n, 1), (2 * n, Kp))
    else:
        H_t = jnp.pad(H.reshape(K, 2 * n), ((0, pad), (0, 0))).T

    F_t = tuple(map(tuple, np.asarray(F, dtype=np.float32)))
    Q_t = tuple(map(tuple, np.asarray(Q, dtype=np.float32)))
    xo, Po, nis = _ekf_call(x_t, P_t, y_t, H_t, F_t, Q_t, float(r),
                            interpret)
    return (xo.T[:K], Po.T[:K].reshape(K, n, n), nis[0, :K])
