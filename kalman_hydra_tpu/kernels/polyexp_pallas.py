"""Pallas-TPU polynomial-expansion kernel (Farneback step 1).

Fuses the 9 separable correlations + inverse-Gram combination of
ops.farneback.poly_expansion into one pass: each grid step DMAs a
(tile + 2n)-row slab of the replicate-padded image into VMEM, runs the
vertical (g, xg, xxg) taps and horizontal moment taps unrolled on the VPU,
and writes the 5 coefficient planes — one HBM read and one write total,
where the XLA version materializes 3 intermediate planes.

Output layout is planar (5, H, W) so each plane tiles (8, 128) cleanly.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._store import batched_store
from ..ops.farneback import _poly_inv_gram


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pe_setup(h: int, w: int, poly_n: int, poly_sigma: float, out_dtype,
              tile_h: int):
    """Shared host-side setup of the single-image and frame-batched
    polyexp kernels (taps, inverse-Gram scalars, tile/pad geometry) —
    single owner so the coefficient math and the alignment policy cannot
    desynchronize between the twins."""
    n = poly_n
    g, ig11, ig03, ig33, ig55 = _poly_inv_gram(n, float(poly_sigma))
    i = np.arange(-n, n + 1, dtype=np.float32)
    gt = tuple(np.float32(v) for v in g)
    xg = tuple(np.float32(v) for v in (i * g))
    xxg = tuple(np.float32(v) for v in (i * i * g))
    igs = (float(ig11), float(ig03), float(ig33), float(ig55))

    # bf16 outputs pack (16, 128) register tiles: the out-block sublane
    # extent must honor that alignment. Round tile_h UP to it (same
    # policy as fi_geometry): a misaligned tile height makes the i*th
    # DMA offsets tile-unaligned, which Mosaic rejects on hardware ONLY.
    align = 16 if jnp.dtype(out_dtype).itemsize < 4 else 8
    th = min(_round_up(int(tile_h), align), _round_up(h, align))
    h_pad = ((h + th - 1) // th) * th
    rows_in = _round_up(th + 2 * n, 8)
    wp = _round_up(w + 2 * n, 128)
    return (gt, xg, xxg), igs, th, h_pad, rows_in, wp


def _polyexp_kernel(n: int, g, xg, xxg, ig11, ig03, ig33, ig55,
                    th: int, w_out: int,
                    in_hbm, out_ref, scratch, sem):
    """Double-buffered slab pipeline (same pattern as flow_iter): scratch
    has a 2-slot leading axis; step i computes from slot i%2 while the
    tile-i+1 copy lands in the other slot."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    # Mosaic: HBM->VMEM slice extents must be (8, 128)-aligned; the input
    # carries matching tail padding
    rows_in = _round_up(th + 2 * n, 8)

    def copy(step, slot):
        return pltpu.make_async_copy(
            in_hbm.at[pl.ds(step * th, rows_in), :], scratch.at[slot],
            sem.at[slot])

    @pl.when(i == 0)
    def _first():
        copy(0, 0).start()

    @pl.when(i + 1 < nsteps)
    def _prefetch():
        copy(i + 1, (i + 1) % 2).start()

    slot = i % 2
    copy(i, slot).wait()
    s = scratch[slot]                               # (th+2n, w_out+2n)
    _pe_compute(n, g, xg, xxg, ig11, ig03, ig33, ig55, th, w_out,
                s, out_ref)


def _pe_compute(n, g, xg, xxg, ig11, ig03, ig33, ig55, th, w_out,
                s, out_ref):
    """Slab -> 5 coefficient planes (shared by the single-image and the
    frame-batched kernels; `s` is the VMEM slab, `out_ref` the (5, th,
    w_out) — or, batched, (1, 5, th, w_out) — output block).

    Batched refs are written through the shared scalar-leading-index
    idiom (kernels/_store.py — .at[0] views reject on hardware)."""
    _st = batched_store(out_ref)
    taps = 2 * n + 1
    # (a banded-MXU vertical-tap variant was A/B'd here and measured
    # neutral on v5e — BASELINE.md round-3 "rejected" ledger, KH_PE_VMXU)
    v0 = v1 = v2 = None
    for k in range(taps):
        row = s[k:k + th, :]
        t0 = g[k] * row
        t1 = xg[k] * row
        t2 = xxg[k] * row
        v0 = t0 if v0 is None else v0 + t0
        v1 = t1 if v1 is None else v1 + t1
        v2 = t2 if v2 is None else v2 + t2

    m00 = m10 = m20 = m01 = m11 = m02 = None
    for k in range(taps):
        c0 = v0[:, k:k + w_out]
        c1 = v1[:, k:k + w_out]
        c2 = v2[:, k:k + w_out]
        a = g[k] * c0
        b = xg[k] * c0
        c = xxg[k] * c0
        d = g[k] * c1
        e = xg[k] * c1
        f = g[k] * c2
        m00 = a if m00 is None else m00 + a
        m10 = b if m10 is None else m10 + b
        m20 = c if m20 is None else m20 + c
        m01 = d if m01 is None else m01 + d
        m11 = e if m11 is None else m11 + e
        m02 = f if m02 is None else m02 + f

    dt = out_ref.dtype
    _st(0, (m10 * ig11).astype(dt))           # b_x
    _st(1, (m01 * ig11).astype(dt))           # b_y
    _st(2, (m00 * ig03 + m20 * ig33).astype(dt))   # a_xx
    _st(3, (m00 * ig03 + m02 * ig33).astype(dt))   # a_yy
    _st(4, (m11 * ig55).astype(dt))  # axy (full xy coefficient)


@functools.partial(jax.jit,
                   static_argnames=("poly_n", "poly_sigma", "out_dtype",
                                    "tile_h", "interpret"))
def poly_expansion_planar(img: jnp.ndarray, poly_n: int, poly_sigma: float,
                          out_dtype=jnp.float32,
                          tile_h: int = 128,
                          interpret: bool = False) -> jnp.ndarray:
    """(H, W) float32 -> (5, H, W) coefficient planes
    [b_x, b_y, a_xx, a_yy, axy]; same math/channels as
    ops.farneback.poly_expansion (which returns (H, W, 5)).

    out_dtype=bfloat16 stores the planes half-width straight from the
    kernel (FlowConfig.bf16_poly): downstream flow_iter slab DMAs then
    move half the bytes; all in-kernel math stays f32."""
    h, w = img.shape
    # cv2 semantics: poly_n IS the half-width (poly_n=5 -> 11 taps), matching
    # ops.farneback.farneback's call poly_expansion(img, cfg.poly_n, ...)
    n = poly_n
    (gt, xg, xxg), igs, th, h_pad, rows_in, wp = _pe_setup(
        h, w, poly_n, poly_sigma, out_dtype, tile_h)
    xp = jnp.pad(img, ((n, n), (n, n)), mode="edge")      # replicate
    xp = jnp.pad(xp, ((0, h_pad - h + rows_in - (th + 2 * n)),
                      (0, wp - (w + 2 * n))))

    out = pl.pallas_call(
        functools.partial(_polyexp_kernel, n, gt, xg, xxg, *igs, th, w),
        grid=(h_pad // th,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((5, th, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, h_pad, w), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_in, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp)
    return out[:, :h, :]


def _polyexp_batch_kernel(n: int, g, xg, xxg, ig11, ig03, ig33, ig55,
                          th: int, w_out: int,
                          in_hbm, out_ref, scratch, sem):
    """Frame-batched twin of _polyexp_kernel: grid (N, n_tiles), one
    launch covers every frame's expansion (launch amortization, same
    rationale as flow_iter_pairs). Double-buffering runs over the linear
    step s = b * n_tiles + i so the slab DMAs overlap compute across
    frame boundaries too."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    s = b * nt + i
    rows_in = _round_up(th + 2 * n, 8)

    def copy(bb, step, slot):
        return pltpu.make_async_copy(
            in_hbm.at[bb, pl.ds(step * th, rows_in), :], scratch.at[slot],
            sem.at[slot])

    @pl.when(s == 0)
    def _first():
        copy(0, 0, 0).start()

    @pl.when(s + 1 < nb * nt)
    def _prefetch():
        s1 = s + 1
        copy(s1 // nt, s1 % nt, s1 % 2).start()

    slot = s % 2
    copy(b, i, slot).wait()
    _pe_compute(n, g, xg, xxg, ig11, ig03, ig33, ig55, th, w_out,
                scratch[slot], out_ref)


@functools.partial(jax.jit,
                   static_argnames=("poly_n", "poly_sigma", "out_dtype",
                                    "tile_h", "interpret"))
def poly_expansion_planar_batch(imgs: jnp.ndarray, poly_n: int,
                                poly_sigma: float, out_dtype=jnp.float32,
                                tile_h: int = 128,
                                interpret: bool = False) -> jnp.ndarray:
    """(N, H, W) float32 frames -> (N, 5, H, W) coefficient planes in ONE
    kernel launch (grid (N, n_tiles)); per-frame numerics identical to
    poly_expansion_planar."""
    nB, h, w = imgs.shape
    n = poly_n
    (gt, xg, xxg), igs, th, h_pad, rows_in, wp = _pe_setup(
        h, w, poly_n, poly_sigma, out_dtype, tile_h)
    xp = jnp.pad(imgs, ((0, 0), (n, n), (n, n)), mode="edge")
    xp = jnp.pad(xp, ((0, 0), (0, h_pad - h + rows_in - (th + 2 * n)),
                      (0, wp - (w + 2 * n))))

    out = pl.pallas_call(
        functools.partial(_polyexp_batch_kernel, n, gt, xg, xxg, *igs,
                          th, w),
        grid=(nB, h_pad // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 5, th, w), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nB, 5, h_pad, w), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_in, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp)
    return out[:, :, :h, :]
