"""Pallas-TPU sparse Lucas-Kanade kernel.

TPU-native replacement for OpenCV's C++ pyrLK tracker inner loop
(SURVEY.md §2.1 #6 native obligation: "Pallas LK kernel ... per-window
structure tensor, iterative G^-1 b refinement with bilinear warp").

Per grid step = one tracked point at one pyramid level:
  1. scalar-prefetched point/guess coordinates compute the window's
     integer base; the prev-image patch and its Scharr-gradient patches
     are DMA'd HBM->VMEM once,
  2. the structure tensor G is reduced on the VPU,
  3. each Gauss-Newton iteration DMAs the next-image patch at the current
     (dynamic) guess, forms b = sum(dI * grad), solves the 2x2 system and
     advances the guess — the patch DMA chases the guess through HBM,
     which is exactly what the CUDA/C++ original did with texture fetches.

The level loop / x2 propagation stays in XLA (ops.lk.lk_sparse structure);
`lk_sparse_pallas` is a drop-in for ops.lk.lk_sparse.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FlowConfig
from ..ops.lk import scharr_gradients
from ..ops.pyramid import build_pyramid

_SLAB_MARGIN = 2  # rows/cols beyond winsize for bilinear +1 and safety


def _lk_point_kernel(win: int, max_iter: int, eps2: float, min_eig: float,
                     pt_ref, guess_ref, imga, gx, gy, imgb,
                     out_ref, ok_ref,
                     pa_s, gx_s, gy_s, pb_s, sem):
    """One point, one level. Images stay in HBM (ANY); patches are DMA'd."""
    k = pl.program_id(0)
    h, w = imga.shape
    slab = win + _SLAB_MARGIN
    half = (win - 1) * 0.5

    px = pt_ref[k, 0]
    py = pt_ref[k, 1]
    # integer window base, clamped so the slab stays in-bounds
    def base(v, limit):
        b = jnp.floor(v - half).astype(jnp.int32)
        return jnp.clip(b, 0, limit - slab)
    ax0 = base(px, w)
    ay0 = base(py, h)
    fax = px - half - ax0.astype(jnp.float32)   # fractional offset in slab
    fay = py - half - ay0.astype(jnp.float32)

    copies = [
        pltpu.make_async_copy(imga.at[pl.ds(ay0, slab), pl.ds(ax0, slab)],
                              pa_s, sem.at[0]),
        pltpu.make_async_copy(gx.at[pl.ds(ay0, slab), pl.ds(ax0, slab)],
                              gx_s, sem.at[1]),
        pltpu.make_async_copy(gy.at[pl.ds(ay0, slab), pl.ds(ax0, slab)],
                              gy_s, sem.at[2]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    def bilin(s, fx, fy):
        """win x win bilinear patch at fractional offset (fx, fy) in slab."""
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        ax = fx - x0.astype(jnp.float32)
        ay = fy - y0.astype(jnp.float32)
        blk = lax.dynamic_slice(s, (y0, x0), (win + 1, win + 1))
        p00 = blk[:win, :win]
        p01 = blk[:win, 1:win + 1]
        p10 = blk[1:win + 1, :win]
        p11 = blk[1:win + 1, 1:win + 1]
        return (p00 * (1 - ax) * (1 - ay) + p01 * ax * (1 - ay)
                + p10 * (1 - ax) * ay + p11 * ax * ay)

    pa = bilin(pa_s[:], fax, fay)
    pgx = bilin(gx_s[:], fax, fay)
    pgy = bilin(gy_s[:], fax, fay)

    g11 = jnp.sum(pgx * pgx)
    g12 = jnp.sum(pgx * pgy)
    g22 = jnp.sum(pgy * pgy)
    eig = ((g11 + g22) - jnp.sqrt((g11 - g22) ** 2 + 4 * g12 ** 2)) \
        * 0.5 / (win * win)
    det = g11 * g22 - g12 * g12
    valid = (eig > min_eig) & (det > 1e-12)
    inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)

    def body(_i, carry):
        gxp, gyp, active = carry

        def do_iter(_):
            bx0 = base(gxp, w)
            by0 = base(gyp, h)

            def with_b(pb_local, sem_b):
                dma = pltpu.make_async_copy(
                    imgb.at[pl.ds(by0, slab), pl.ds(bx0, slab)],
                    pb_local, sem_b)
                dma.start()
                dma.wait()
                fbx = gxp - half - bx0.astype(jnp.float32)
                fby = gyp - half - by0.astype(jnp.float32)
                pb = bilin(pb_local[:], fbx, fby)
                diff = pb - pa
                b1 = jnp.sum(diff * pgx)
                b2 = jnp.sum(diff * pgy)
                dx = -(g22 * b1 - g12 * b2) * inv_det
                dy = -(g11 * b2 - g12 * b1) * inv_det
                return dx, dy

            dx, dy = pl.run_scoped(
                with_b,
                pltpu.VMEM((slab, slab), jnp.float32),
                pltpu.SemaphoreType.DMA)
            return gxp + dx, gyp + dy, (dx * dx + dy * dy) > eps2

        def skip(_):
            return gxp, gyp, active

        return lax.cond(active, do_iter, skip, None)

    gx_new, gy_new, _ = lax.fori_loop(
        0, max_iter, body, (guess_ref[k, 0], guess_ref[k, 1], valid))
    out_ref[0, 0] = gx_new
    out_ref[0, 1] = gy_new
    ok_ref[0, 0] = valid.astype(jnp.int32)


def _lk_level(img_a, img_b, gx, gy, pts, guess, cfg: FlowConfig,
              interpret: bool):
    K = pts.shape[0]
    win = cfg.lk_winsize
    half = (win - 1) // 2
    h, w = img_a.shape
    # replicate-pad so every window slab is in-bounds; identical to the
    # per-sample border clamp of ops.lk.bilinear_sample (edge replication)
    pad = half + _SLAB_MARGIN
    def prep(x):
        return jnp.pad(x, ((pad, pad), (pad, pad)), mode="edge")
    img_a, img_b, gx, gy = prep(img_a), prep(img_b), prep(gx), prep(gy)
    pts = jnp.clip(pts, 0.0, jnp.asarray([w - 1.0, h - 1.0])) + pad
    guess = jnp.clip(guess, -float(pad // 2),
                     jnp.asarray([w - 1.0 + pad // 2,
                                  h - 1.0 + pad // 2])) + pad
    kernel = functools.partial(
        _lk_point_kernel, win, cfg.lk_max_iter,
        float(cfg.lk_eps) ** 2, float(cfg.lk_min_eig))
    slab = win + _SLAB_MARGIN

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # pts, guess
        grid=(K,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec((1, 2), lambda k, *_: (k, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1), lambda k, *_: (k, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((slab, slab), jnp.float32),
            pltpu.VMEM((slab, slab), jnp.float32),
            pltpu.VMEM((slab, slab), jnp.float32),
            pltpu.VMEM((slab, slab), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ])
    out, ok = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((K, 2), jnp.float32),
                   jax.ShapeDtypeStruct((K, 1), jnp.int32)),
        interpret=interpret,
    )(pts, guess, img_a, gx, gy, img_b)
    return out - pad, ok[:, 0] > 0


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def lk_sparse(prev: jnp.ndarray, nxt: jnp.ndarray, pts: jnp.ndarray,
              cfg: FlowConfig, interpret: bool = False):
    """Drop-in Pallas twin of ops.lk.lk_sparse: (new_pts, status)."""
    pyr_a = build_pyramid(prev.astype(jnp.float32), cfg.levels)
    pyr_b = build_pyramid(nxt.astype(jnp.float32), cfg.levels)
    guess = pts * (1.0 / 2 ** (cfg.levels - 1))
    status = jnp.ones(pts.shape[0], dtype=bool)
    for lvl in range(cfg.levels - 1, -1, -1):
        img_a, img_b = pyr_a[lvl], pyr_b[lvl]
        gx, gy = scharr_gradients(img_a)
        pt_l = pts * (1.0 / 2 ** lvl)
        guess, ok = _lk_level(img_a, img_b, gx, gy, pt_l, guess, cfg,
                              interpret)
        if lvl == 0:
            h, w = img_a.shape
            inb = ((guess[:, 0] >= 0) & (guess[:, 0] <= w - 1)
                   & (guess[:, 1] >= 0) & (guess[:, 1] <= h - 1))
            status = status & ok & inb
        else:
            guess = guess * 2.0
    return guess, status
