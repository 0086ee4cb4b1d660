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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lk_point_kernel(win: int, max_iter: int, eps2: float, min_eig: float,
                     pt_ref, guess_ref, imga, gx, gy, imgb,
                     out_ref, ok_ref,
                     pa_s, gx_s, gy_s, pb_s, sem):
    """One point, one level. Images stay in HBM (ANY); patches are DMA'd.

    Hardware notes (v5e Mosaic, discovered by compiling on silicon):
    HBM/VMEM memrefs are (8, 128)-tiled, so DMA slice OFFSETS must be
    provably tile-aligned, not just the extents. The window base is
    therefore aligned DOWN to the (8, 128) grid and the residual offset
    is resolved in VMEM: an 8-way select-sum for sublanes and a dynamic
    pltpu.roll for lanes. Results land in SMEM (scalar stores at the
    dynamic point index — VMEM output blocks smaller than (8, 128) are
    rejected by the block-shape rule)."""
    k = pl.program_id(0)
    h, w = imga.shape
    slab = win + _SLAB_MARGIN
    rs = _round_up(slab + 7, 8)         # DMA row extent (+<=7 misalign)
    cs = 256                            # DMA lane extent (+<=127 misalign)
    hc = h - rs                         # content (replicate-padded) dims:
    wc = w - cs                         # the wrapper adds (rs, cs) margins
    half = (win - 1) * 0.5

    px = pt_ref[k, 0]
    py = pt_ref[k, 1]
    # integer window base, clamped to the content region
    def base(v, limit):
        b = jnp.floor(v - half).astype(jnp.int32)
        return jnp.clip(b, 0, limit - slab)

    def aligned(b, m):
        ba = (b // m) * m
        return ba, b - ba

    ax0 = base(px, wc)
    ay0 = base(py, hc)
    ax128, dxo = aligned(ax0, 128)
    ay8, dyo = aligned(ay0, 8)
    fax = px - half - ax0.astype(jnp.float32)   # pure fraction in [0, 1)
    fay = py - half - ay0.astype(jnp.float32)

    copies = [
        pltpu.make_async_copy(imga.at[pl.ds(ay8, rs), pl.ds(ax128, cs)],
                              pa_s, sem.at[0]),
        pltpu.make_async_copy(gx.at[pl.ds(ay8, rs), pl.ds(ax128, cs)],
                              gx_s, sem.at[1]),
        pltpu.make_async_copy(gy.at[pl.ds(ay8, rs), pl.ds(ax128, cs)],
                              gy_s, sem.at[2]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    def window(s, dy, dx):
        """(rs, cs) slab -> (win+1, win+1) block at integer offset
        (dy in [0, 8), dx in [0, 128)): sublane shift via 8-way
        select-sum, lane shift via dynamic roll."""
        rows = None
        for j in range(8):
            t = jnp.where(dy == j, s[j:j + win + 1, :], 0.0)
            rows = t if rows is None else rows + t
        return pltpu.roll(rows, -dx, axis=1)[:, :win + 1]

    def bilin(blk, ax, ay):
        """win x win bilinear patch at fraction (ax, ay) in [0, 1)."""
        p00 = blk[:win, :win]
        p01 = blk[:win, 1:win + 1]
        p10 = blk[1:win + 1, :win]
        p11 = blk[1:win + 1, 1:win + 1]
        return (p00 * (1 - ax) * (1 - ay) + p01 * ax * (1 - ay)
                + p10 * (1 - ax) * ay + p11 * ax * ay)

    pa = bilin(window(pa_s[:], dyo, dxo), fax, fay)
    pgx = bilin(window(gx_s[:], dyo, dxo), fax, fay)
    pgy = bilin(window(gy_s[:], dyo, dxo), fax, fay)

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
            # clamp the center into the valid interior (same semantics as
            # ops.lk._track_point_level): the fraction then stays in
            # [0, 1) and the base clamp never binds
            gxc = jnp.clip(gxp, half, jnp.float32(wc) - 1.0 - half - 2.0)
            gyc = jnp.clip(gyp, half, jnp.float32(hc) - 1.0 - half - 2.0)
            bx0 = base(gxc, wc)
            by0 = base(gyc, hc)
            bx128, bdx = aligned(bx0, 128)
            by8, bdy = aligned(by0, 8)

            def with_b(pb_local, sem_b):
                dma = pltpu.make_async_copy(
                    imgb.at[pl.ds(by8, rs), pl.ds(bx128, cs)],
                    pb_local, sem_b)
                dma.start()
                dma.wait()
                fbx = gxc - half - bx0.astype(jnp.float32)
                fby = gyc - half - by0.astype(jnp.float32)
                pb = bilin(window(pb_local[:], bdy, bdx), fbx, fby)
                diff = pb - pa
                b1 = jnp.sum(diff * pgx)
                b2 = jnp.sum(diff * pgy)
                dx = -(g22 * b1 - g12 * b2) * inv_det
                dy = -(g11 * b2 - g12 * b1) * inv_det
                return dx, dy

            dx, dy = pl.run_scoped(
                with_b,
                pltpu.VMEM((rs, cs), jnp.float32),
                pltpu.SemaphoreType.DMA)
            return gxp + dx, gyp + dy, (dx * dx + dy * dy) > eps2

        def skip(_):
            return gxp, gyp, active

        return lax.cond(active, do_iter, skip, None)

    gx_new, gy_new, _ = lax.fori_loop(
        0, max_iter, body, (guess_ref[k, 0], guess_ref[k, 1], valid))
    out_ref[k, 0] = gx_new
    out_ref[k, 1] = gy_new
    ok_ref[k] = valid.astype(jnp.int32)


def _lk_level(img_a, img_b, gx, gy, pts, guess, cfg: FlowConfig,
              interpret: bool):
    K = pts.shape[0]
    win = cfg.lk_winsize
    half = (win - 1) // 2
    h, w = img_a.shape
    # replicate-pad so every window slab is in-bounds; identical to the
    # per-sample border clamp of ops.lk.bilinear_sample (edge replication)
    pad = half + _SLAB_MARGIN
    slab = win + _SLAB_MARGIN
    rs = ((slab + 7 + 7) // 8) * 8
    cs = 256
    def prep(x):
        x = jnp.pad(x, ((pad, pad), (pad, pad)), mode="edge")
        # aligned-DMA margins: a base aligned DOWN to the (8, 128) grid
        # plus the (rs, cs) extent always stays in-bounds
        return jnp.pad(x, ((0, rs), (0, cs)))
    img_a, img_b, gx, gy = prep(img_a), prep(img_b), prep(gx), prep(gy)
    pts = jnp.clip(pts, 0.0, jnp.asarray([w - 1.0, h - 1.0])) + pad
    guess = jnp.clip(guess, -float(pad // 2),
                     jnp.asarray([w - 1.0 + pad // 2,
                                  h - 1.0 + pad // 2])) + pad
    kernel = functools.partial(
        _lk_point_kernel, win, cfg.lk_max_iter,
        float(cfg.lk_eps) ** 2, float(cfg.lk_min_eig))

    # pin the images to HBM: with ANY, Mosaic may place small pyramid
    # levels in VMEM, where slices must be (8, 128)-tile-aligned and
    # the per-point dynamic window offsets fail to prove divisibility.
    # SMEM outputs: scalar stores at the dynamic point index (tiny
    # VMEM blocks violate Mosaic's (8, 128) block-shape rule).
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * 4
    out_specs = (pl.BlockSpec(memory_space=pltpu.SMEM),
                 pl.BlockSpec(memory_space=pltpu.SMEM))
    scratch_shapes = [
        pltpu.VMEM((rs, cs), jnp.float32),
        pltpu.VMEM((rs, cs), jnp.float32),
        pltpu.VMEM((rs, cs), jnp.float32),
        pltpu.VMEM((rs, cs), jnp.float32),
        pltpu.SemaphoreType.DMA((3,)),
    ]

    def call(pts_c, guess_c):
        Kc = pts_c.shape[0]                 # always CH after padding below
        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(Kc,),
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch_shapes)
        return pl.pallas_call(
            kernel,
            grid_spec=spec,
            out_shape=(jax.ShapeDtypeStruct((Kc, 2), jnp.float32),
                       jax.ShapeDtypeStruct((Kc,), jnp.int32)),
            interpret=interpret,
        )(pts_c, guess_c, img_a, gx, gy, img_b)

    # SMEM holds ~1 MB and per-point scalar outputs pad to 512 B each:
    # K > ~400 overflows it, so the point set is processed in <=256-point
    # chunks. The set is PADDED to a multiple of 256 (replicating point 0;
    # the surplus results are dropped below) so every chunk has the same
    # (256,) grid/out_shape => exactly one ~5-10 s Mosaic relay compile,
    # reused, instead of a second compile for a ragged tail chunk.
    CH = 256
    K_pad = ((K + CH - 1) // CH) * CH
    if K_pad != K:
        rep = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[0:1], (K_pad - K,) + a.shape[1:])])
        pts, guess = rep(pts), rep(guess)
    outs, oks = [], []
    for lo in range(0, K_pad, CH):
        o, k_ = call(pts[lo:lo + CH], guess[lo:lo + CH])
        outs.append(o)
        oks.append(k_)
    out = jnp.concatenate(outs, axis=0)[:K]
    ok = jnp.concatenate(oks, axis=0)[:K]
    return out - pad, ok > 0


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
