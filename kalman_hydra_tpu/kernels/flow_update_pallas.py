"""Pallas-TPU fused Farneback flow-update kernel.

Fuses ops.farneback.update_matrices + the winsize smoothing +
the per-pixel 2x2 solve of update_flow into ONE pass over the image:
per row-tile, DMA the (halo-extended) slabs of R0, warped-R1 and the prior
flow into VMEM, form the normal-equation channels (with OpenCV's border
damping), apply the separable window (box or Gaussian, unrolled taps), and
solve for the new absolute flow — a single HBM read/write where the XLA
pipeline materializes the 5 M-planes and 2 smoothing intermediates.

The bilinear warp of R1 by the prior flow stays in XLA (TPU gathers are
better lowered there; SURVEY.md §7 "gather-heavy warping"); everything
after the gather is fused here.

Planar layouts: R0/R1w (5, H, W), flow (2, H, W).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.filters import gaussian_kernel
from .flow_iter_pallas import _damp_vec  # shared OpenCV border taper


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _flow_update_kernel(th: int, w: int, h: int, bw: int, weights,
                        r0_hbm, r1_hbm, fl_hbm, out_ref,
                        r0_s, r1_s, fl_s, sem):
    i = pl.program_id(0)
    # Mosaic requires HBM->VMEM slice extents 8-aligned on the sublane dim;
    # the inputs carry enough tail padding for the rounded-up slab
    rows = _round8(th + 2 * bw)
    wp = ((w + 2 * bw + 127) // 128) * 128   # 128-aligned lane extent
    copies = [
        pltpu.make_async_copy(src.at[:, pl.ds(i * th, rows), :], dst,
                              sem.at[slot])
        for (src, dst, slot) in ((r0_hbm, r0_s, 0), (r1_hbm, r1_s, 1),
                                 (fl_hbm, fl_s, 2))]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    R0 = r0_s[:]
    R1 = r1_s[:]
    fl = fl_s[:]
    dx = fl[0]
    dy = fl[1]

    a_xx = (R0[2] + R1[2]) * 0.5
    a_yy = (R0[3] + R1[3]) * 0.5
    axy = (R0[4] + R1[4]) * 0.25
    db_x = (R0[0] - R1[0]) * 0.5 + a_xx * dx + axy * dy
    db_y = (R0[1] - R1[1]) * 0.5 + axy * dx + a_yy * dy

    # border damp in ABSOLUTE image coords (slab row r -> image row
    # i*th + r - bw, clipped == the replicate-padded row's source)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0) \
        + i * th - bw
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1) - bw
    damp = _damp_vec(row_ids, h) * _damp_vec(col_ids, w)
    a_xx = a_xx * damp
    a_yy = a_yy * damp
    axy = axy * damp
    db_x = db_x * damp
    db_y = db_y * damp

    m0 = a_xx * a_xx + axy * axy           # G_xx
    m1 = (a_xx + a_yy) * axy               # G_xy
    m2 = a_yy * a_yy + axy * axy           # G_yy
    m3 = a_xx * db_x + axy * db_y          # h_x
    m4 = axy * db_x + a_yy * db_y          # h_y

    taps = 2 * bw + 1
    outs = []
    for m in (m0, m1, m2, m3, m4):
        v = None
        for k in range(taps):
            t = weights[k] * m[k:k + th, :]
            v = t if v is None else v + t
        hsum = None
        for k in range(taps):
            t = weights[k] * v[:, k:k + w]
            hsum = t if hsum is None else hsum + t
        outs.append(hsum)
    g11, g12, g22, h1, h2 = outs

    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    out_ref[0, :, :] = (g22 * h1 - g12 * h2) * idet
    out_ref[1, :, :] = (g11 * h2 - g12 * h1) * idet


@functools.partial(jax.jit, static_argnames=("winsize", "gaussian",
                                             "interpret"))
def flow_update(R0p: jnp.ndarray, R1wp: jnp.ndarray, flow_p: jnp.ndarray,
                winsize: int, gaussian: bool = False,
                interpret: bool = False) -> jnp.ndarray:
    """Fused M + window smoothing + solve.

    R0p, R1wp: (5, H, W) polynomial planes (R1wp already warped by the
    prior flow); flow_p: (2, H, W) prior flow. Returns (2, H, W) new flow.
    Matches ops.farneback.update_matrices + update_flow with the window
    normalized to sum 1 (box mean / normalized Gaussian).
    """
    _, h, w = R0p.shape
    bw = winsize // 2
    if gaussian:
        kern = gaussian_kernel(2 * bw + 1, bw * 0.3).astype(np.float64)
    else:
        kern = np.full(2 * bw + 1, 1.0 / (2 * bw + 1), dtype=np.float64)
    weights = tuple(np.float32(v) for v in kern)

    th = 64 if h >= 64 else ((h + 7) // 8) * 8
    h_pad = ((h + th - 1) // th) * th
    rows = _round8(th + 2 * bw)       # 8-aligned DMA slab (see kernel)
    extra = rows - (th + 2 * bw)

    wp = ((w + 2 * bw + 127) // 128) * 128   # 128-aligned lane extent

    def prep(x):
        x = jnp.pad(x, ((0, 0), (bw, bw), (bw, bw)), mode="edge")
        return jnp.pad(x, ((0, 0), (0, h_pad - h + extra),
                           (0, wp - (w + 2 * bw))))

    r0 = prep(R0p)
    r1 = prep(R1wp)
    fl = prep(flow_p)

    out = pl.pallas_call(
        functools.partial(_flow_update_kernel, th, w, h, bw, weights),
        grid=(h_pad // th,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec((2, th, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h_pad, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((5, rows, wp), jnp.float32),
            pltpu.VMEM((5, rows, wp), jnp.float32),
            pltpu.VMEM((2, rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r0, r1, fl)
    return out[:, :h, :]
