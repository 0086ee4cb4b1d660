"""Whole-level multi-iteration Farneback kernel for coarse pyramid levels.

The per-iteration fused kernel (flow_iter_pallas) launches once per
iteration and pays XLA pad/crop dispatches around every launch — at
coarse levels (<=270p of a 1080p pyramid) that fixed cost dominates the
actual compute (tools/fi_decomp_ab.py: the four coarse levels add
~2.3 ms/frame while their FLOPs are a rounding error). This kernel runs
ALL cfg.iterations of one level in a single launch with everything
VMEM-resident:

  - R0/R1 plane stacks load once (VMEM BlockSpecs, bf16 storage ok);
  - the flow carry lives in a VMEM scratch between iterations;
  - each unrolled iteration = select-sum warp + averaged-matrix normal
    equations + border damping/edge replication + separable winsize
    smoothing + 2x2 solve — the same math as _flow_iter_kernel, single
    tile, no shift-skip (coarse tiles span the full displacement range
    anyway).

Key layout fact that makes the carry cheap: the flow HALO is dead.
M computed at out-of-image rows/cols is overwritten by the OpenCV edge
replication (row_fix/col_fix) before smoothing, so the scratch store
only needs the (sublane, lane)-aligned image region — halo values from
the previous iteration are never read into anything that survives.

Numerics match update_matrices_p(fast_warp=D) + update_flow_p exactly
(f32 accumulation; bf16 only as the R-plane storage dtype, same policy
as flow_iter_pallas).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.filters import gaussian_kernel
from .flow_iter_pallas import _damp_vec, _round_up


def _flow_level_kernel(lh: int, lw: int, lh_r: int, lw_r: int,
                       ra: int, ca: int, bw: int, D: int, iters: int,
                       weights, r0_ref, r1_ref, fl0_ref, out_ref, scr):
    """Single grid step; iterations unrolled in Python (iters is static).

    Layout: image row 0 / col 0 sits at (ra, ca) in every (PH, PW)
    buffer; edge padding extends hb = bw + D beyond the image on each
    side (prepared in XLA); everything else is zero / don't-care.
    """
    mrows = lh_r + 2 * bw
    mcols = lw_r + 2 * bw
    PW = r0_ref.shape[2]

    R0f = r0_ref[...]
    R1 = r1_ref[...]
    wdt = jnp.float32
    R1 = R1.astype(wdt)
    R0 = R0f[:, ra - bw:ra - bw + mrows, ca - bw:ca - bw + mcols].astype(
        jnp.float32)

    for it in range(iters):
        src = fl0_ref if it == 0 else scr
        # flow over the M region rows, full padded width (vertical warp
        # stage works at full width like the tiled kernel)
        flm = src[:, ra - bw:ra - bw + mrows, :].astype(jnp.float32)
        if it > 0:
            # the scratch store covers only the aligned image region, but
            # the select-sum warp reads flow at out-of-image positions
            # (dy at the SAMPLE column feeds the vertical stage) — the
            # XLA path edge-pads flow every iteration, so replicate the
            # edge into the halo here for exact parity
            fir = jax.lax.broadcasted_iota(jnp.int32, (mrows, PW), 0) - bw
            fic = jax.lax.broadcasted_iota(jnp.int32, (mrows, PW), 1) - ca
            fixed = []
            for p in range(2):
                m = flm[p]
                top_row = jnp.sum(jnp.where(fir == 0, m, 0.0), axis=0,
                                  keepdims=True)
                bot_row = jnp.sum(jnp.where(fir == lh - 1, m, 0.0),
                                  axis=0, keepdims=True)
                m = jnp.where(fir < 0, top_row, m)
                m = jnp.where(fir > lh - 1, bot_row, m)
                m = jnp.where(fic < 0, m[:, ca:ca + 1], m)
                m = jnp.where(fic > lw - 1, m[:, ca + lw - 1:ca + lw], m)
                fixed.append(m)
            flm = jnp.stack(fixed)
        dx = flm[0]
        dy = flm[1]

        # ---- select-sum bilinear warp of R1 by (dx, dy) ----
        dxc = jnp.clip(dx, -D, D)
        dyc = jnp.clip(dy, -D, D)
        y_idx = jnp.floor(dyc).astype(jnp.int32)
        x_idx = jnp.floor(dxc).astype(jnp.int32)
        ay2 = dyc - y_idx.astype(jnp.float32)
        ax = dxc - x_idx.astype(jnp.float32)
        xm = x_idx[:, ca - bw:ca - bw + mcols]
        axm2 = ax[:, ca - bw:ca - bw + mcols]

        v = None
        for j in range(2 * D + 2):
            wj = jnp.where(y_idx == (j - D), 1.0 - ay2, 0.0)
            if j >= 1:
                wj = wj + jnp.where(y_idx == (j - 1 - D), ay2, 0.0)
            # M row r (buffer row ra - bw + r) warped by dy==j-D reads R1
            # buffer row ra - bw + r + (j - D)
            t = wj.astype(wdt)[None] * R1[:, ra - bw - D + j:
                                          ra - bw - D + j + mrows, :]
            v = t if v is None else v + t           # (5, mrows, PW)

        R1w = None
        for j in range(2 * D + 2):
            sh = j - D
            wj = jnp.where(xm == sh, 1.0 - axm2, 0.0)
            if j >= 1:
                wj = wj + jnp.where(xm == sh - 1, axm2, 0.0)
            t = wj.astype(wdt)[None] * v[:, :, ca - bw + sh:
                                         ca - bw + sh + mcols]
            R1w = t if R1w is None else R1w + t     # (5, mrows, mcols)

        # ---- averaged-matrix normal equations ----
        R1w = R1w.astype(jnp.float32)
        dxm = dx[:, ca - bw:ca - bw + mcols]
        dym = dy[:, ca - bw:ca - bw + mcols]
        a_xx = (R0[2] + R1w[2]) * 0.5
        a_yy = (R0[3] + R1w[3]) * 0.5
        axy = (R0[4] + R1w[4]) * 0.25
        db_x = (R0[0] - R1w[0]) * 0.5 + a_xx * dxm + axy * dym
        db_y = (R0[1] - R1w[1]) * 0.5 + axy * dxm + a_yy * dym

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (mrows, mcols), 0) \
            - bw
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (mrows, mcols), 1) \
            - bw
        damp = _damp_vec(row_ids[:, 0:1], lh) * _damp_vec(col_ids[0:1, :],
                                                          lw)
        a_xx = a_xx * damp
        a_yy = a_yy * damp
        axy = axy * damp
        db_x = db_x * damp
        db_y = db_y * damp

        m0 = a_xx * a_xx + axy * axy
        m1 = (a_xx + a_yy) * axy
        m2 = a_yy * a_yy + axy * axy
        m3 = a_xx * db_x + axy * db_y
        m4 = axy * db_x + a_yy * db_y

        # ---- replicate M at the image borders (XLA parity) ----
        # one tile spans the whole level, so top AND bottom are always
        # present (no scalar guard needed); rows in [lh, lh_r + bw) —
        # the lane-rounding extension — replicate the bottom edge too,
        # exactly like the out-of-image halo.
        ir = row_ids[:, 0:1]
        ic = col_ids[0:1, :]
        top_sel = (ir == 0)
        bot_sel = (ir == lh - 1)
        ms = []
        for m in (m0, m1, m2, m3, m4):
            top_row = jnp.sum(jnp.where(top_sel, m, 0.0), axis=0,
                              keepdims=True)
            bot_row = jnp.sum(jnp.where(bot_sel, m, 0.0), axis=0,
                              keepdims=True)
            m = jnp.where(ir < 0, top_row, m)
            m = jnp.where(ir > lh - 1, bot_row, m)
            m = jnp.where(ic < 0, m[:, bw:bw + 1], m)
            m = jnp.where(ic > lw - 1, m[:, lw + bw - 1:lw + bw], m)
            ms.append(m)

        # ---- separable winsize smoothing + 2x2 solve ----
        taps = 2 * bw + 1
        outs = []
        for m in ms:
            if weights is None:
                # uniform box factored as box3 o stride-3 box_a (exact)
                a = taps // 3
                inv = 1.0 / taps
                s3 = None
                for k in range(3):
                    t = m[k:k + lh_r + taps - 3, :]
                    s3 = t if s3 is None else s3 + t
                vsum = None
                for j in range(a):
                    t = s3[3 * j:3 * j + lh_r, :]
                    vsum = t if vsum is None else vsum + t
                s3h = None
                for k in range(3):
                    t = vsum[:, k:k + lw_r + taps - 3]
                    s3h = t if s3h is None else s3h + t
                hsum = None
                for j in range(a):
                    t = s3h[:, 3 * j:3 * j + lw_r]
                    hsum = t if hsum is None else hsum + t
                hsum = hsum * (inv * inv)
            else:
                vsum = None
                for k in range(taps):
                    t = float(weights[k]) * m[k:k + lh_r, :]
                    vsum = t if vsum is None else vsum + t
                hsum = None
                for k in range(taps):
                    t = float(weights[k]) * vsum[:, k:k + lw_r]
                    hsum = t if hsum is None else hsum + t
            outs.append(hsum)
        g11, g12, g22, h1, h2 = outs
        idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
        fx = (g22 * h1 - g12 * h2) * idet           # (lh_r, lw_r)
        fy = (g11 * h2 - g12 * h1) * idet

        if it + 1 < iters:
            # aligned store of the image region only; the halo keeps the
            # previous iteration's (dead) values
            scr[0, ra:ra + lh_r, ca:ca + lw_r] = fx
            scr[1, ra:ra + lh_r, ca:ca + lw_r] = fy
        else:
            out_ref[0, :, :] = fx
            out_ref[1, :, :] = fy


@functools.partial(jax.jit, static_argnames=("winsize", "max_disp",
                                             "gaussian", "iters",
                                             "interpret"))
def flow_level(R0p: jnp.ndarray, R1p: jnp.ndarray, flow_p: jnp.ndarray,
               winsize: int, max_disp: int, iters: int,
               gaussian: bool = False,
               interpret: bool = False) -> jnp.ndarray:
    """All `iters` Farneback iterations of one coarse level, one launch.

    R0p, R1p: (5, lh, lw) UNWARPED polyexp planes (f32 or bf16 storage);
    flow_p: (2, lh, lw) prior flow (f32). Returns (2, lh, lw) new flow.
    Matches `iters` applications of update_matrices_p(fast_warp=max_disp)
    + update_flow_p. Use fits_vmem() to decide eligibility per level.
    """
    _, lh, lw = R0p.shape
    bw = winsize // 2
    D = int(max_disp)
    hb = bw + D
    if gaussian:
        kern = gaussian_kernel(2 * bw + 1, bw * 0.3).astype(np.float64)
        weights = tuple(np.float32(v) for v in kern)
    elif (2 * bw + 1) % 3 == 0:
        weights = None
    else:
        kern = np.full(2 * bw + 1, 1.0 / (2 * bw + 1), dtype=np.float64)
        weights = tuple(np.float32(v) for v in kern)

    # image origin at (ra, ca): sublane/lane-aligned so the scratch flow
    # store needs no masking; edge padding reaches hb beyond the image
    _bw, _hb, ra, ca, lh_r, lw_r, PH, PW = _fl_geometry(
        lh, lw, winsize, max_disp)

    def prep(x, f32=False):
        if f32:
            x = x.astype(jnp.float32)
        x = jnp.pad(x, ((0, 0), (hb, hb), (hb, hb)), mode="edge")
        return jnp.pad(x, ((0, 0), (ra - hb, PH - (ra + lh + hb)),
                           (ca - hb, PW - (ca + lw + hb))))

    r0 = prep(R0p)
    r1 = prep(R1p)
    fl = prep(flow_p, f32=True)

    out = pl.pallas_call(
        functools.partial(_flow_level_kernel, lh, lw, lh_r, lw_r,
                          ra, ca, bw, D, iters, weights),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, lh_r, lw_r), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, PH, PW), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r0, r1, fl)
    return out[:, :lh, :lw]


def _fl_geometry(lh: int, lw: int, winsize: int, max_disp: int):
    """Padded-layout geometry — the SINGLE owner shared by flow_level and
    fits_vmem so the eligibility estimate can't diverge from the real
    buffer shapes. Returns (bw, hb, ra, ca, lh_r, lw_r, PH, PW)."""
    bw = winsize // 2
    hb = bw + int(max_disp)
    ra = _round_up(hb, 16)
    ca = 128
    lh_r = _round_up(lh, 16)
    lw_r = _round_up(lw, 128)
    PH = _round_up(ra + lh_r + hb + 1, 16)
    PW = _round_up(ca + lw_r + hb + 1, 128)
    return bw, hb, ra, ca, lh_r, lw_r, PH, PW


def fits_vmem(lh: int, lw: int, winsize: int, max_disp: int,
              itemsize: int, budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Conservative VMEM estimate for flow_level eligibility.

    Counts the resident buffers (R0, R1, flow input, scratch, out) plus
    the dominant transients (v, R1w and ~4 live M-sized f32 maps).
    """
    bw, _hb, _ra, _ca, lh_r, lw_r, PH, PW = _fl_geometry(
        lh, lw, winsize, max_disp)
    mrows, mcols = lh_r + 2 * bw, lw_r + 2 * bw
    resident = (2 * 5 * PH * PW * itemsize      # R0 + R1
                + 2 * 2 * PH * PW * 4           # flow in + scratch
                + 2 * lh_r * lw_r * 4)          # out
    transient = (5 * mrows * PW * 4             # v
                 + 5 * mrows * mcols * 4        # R1w
                 + 4 * mrows * mcols * 4)       # live M maps
    return resident + transient <= budget_bytes
