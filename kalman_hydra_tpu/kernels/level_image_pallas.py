"""Pallas-TPU fused Farneback level-image kernel: Gaussian blur of the
ORIGINAL image + INTER_LINEAR resize for every pyramid level, in one pass.

cv2.calcOpticalFlowFarneback builds each level image by blurring the
full-resolution input (sigma = (1/scale-1)/2, ksize up to 79 at the
coarsest 1080p level) and resizing — the XLA twin
(ops.pyramid.farneback_images) materializes a full-res blurred
intermediate per level (~40 MB of HBM traffic each). Here both separable
passes AND the bilinear resize collapse into two banded-matrix MXU
contractions per level:

    level_k = V_k @ img @ Hm_k^T
    V_k[yo, y] = sum_f lerp_f(yo) * gauss_k[y - src_f(yo)]   (reflect101)

with the resize's half-pixel-center index math and edge clamping baked
into the (tiny, host-built) band matrices — the same trick as the MXU
pyr_down, extended to compose blur and resize exactly. The image is
DMA'd/resident once; every level reads it from VMEM. Level 0 (ksize 3,
no resize) stays on the cheap XLA shifted-add path.

HIGHEST-precision dots are mandatory: default MXU bf16 operand rounding
costs ~0.5 intensity on u8-scale images (see pyramid_pallas).
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._store import batched_store
from ..ops.filters import gaussian_kernel
from ..ops.pyramid import farneback_levels


def _reflect101(idx: int, n: int) -> int:
    if idx < 0:
        idx = -idx
    if idx >= n:
        idx = 2 * n - 2 - idx
    return int(np.clip(idx, 0, n - 1))


@functools.lru_cache(maxsize=16)
def _band_mats(h: int, w: int, levels: int, pyr_scale: float):
    """Plan-aligned tuple (coarsest first, same order/length as
    farneback_levels): entry i is (V (lh, h), HmT (w, lw)) float32 band
    matrices composing blur + resize for that level, or None at the
    level-0 entry (which takes the XLA path)."""
    plan = farneback_levels(h, w, levels, pyr_scale)
    mats = []
    for (k, lh, lw, sigma, ksize) in plan:
        if k == 0:
            mats.append(None)       # level 0: XLA path
            continue
        g = gaussian_kernel(ksize, sigma).astype(np.float64)
        r = ksize // 2

        def blur_row(c: int, n: int) -> np.ndarray:
            row = np.zeros(n, np.float64)
            for t in range(ksize):
                row[_reflect101(c + t - r, n)] += g[t]
            return row

        def axis_mat(n_out: int, n_in: int) -> np.ndarray:
            from ..ops.pyramid import resize_coeffs
            M = np.zeros((n_out, n_in), np.float64)
            i0s, i1s, fs = resize_coeffs(n_out, n_in)
            for o in range(n_out):
                f = float(fs[o])
                M[o] += (1.0 - f) * blur_row(int(i0s[o]), n_in)
                if f > 0.0:
                    M[o] += f * blur_row(int(i1s[o]), n_in)
            return M

        V = axis_mat(lh, h).astype(np.float32)
        HmT = axis_mat(lw, w).astype(np.float32).T
        mats.append((V, HmT))
    return tuple(mats)


@functools.lru_cache(maxsize=16)
def _band_mats_padded(h: int, w: int, levels: int, pyr_scale: float,
                      n: int):
    """Like _band_mats but each level's matrices emit a REPLICATE-PADDED
    level image ((lh+2n, lw+2n)): padded row o reads blur row
    clamp(o-n, 0, lh-1) — so the fused polyexp can run valid-mode
    correlations directly on the VMEM-resident product, with border
    semantics identical to correlate1d(border='replicate')."""
    base = _band_mats(h, w, levels, pyr_scale)
    out = []
    for m in base:
        if m is None:
            out.append(None)
            continue
        V, HmT = m
        lh = V.shape[0]
        lw = HmT.shape[1]
        rows = np.clip(np.arange(-n, lh + n), 0, lh - 1)
        cols = np.clip(np.arange(-n, lw + n), 0, lw - 1)
        out.append((V[rows], HmT[:, cols]))
    return tuple(out)


def _levels_polyexp_kernel(nlev: int, n: int, taps, igs, out_dtype,
                           img_ref, *refs):
    """Per coarse level: two MXU band contractions -> padded level image
    in VMEM -> the 9 separable polyexp correlations + inverse-Gram
    combination (kernels/polyexp_pallas math) -> 5 coefficient planes.
    One kernel launch for the whole coarse pyramid; level images never
    touch HBM."""
    g, xg, xxg = taps
    ig11, ig03, ig33, ig55 = igs
    vs = refs[:nlev]
    hs = refs[nlev:2 * nlev]
    outs = refs[2 * nlev:]
    # batched refs carry a leading size-1 block axis, written through the
    # shared scalar-leading-index idiom (kernels/_store.py — .at[0] views
    # reject on hardware for the unaligned coarse-level extents)
    img = img_ref[0] if len(img_ref.shape) == 3 else img_ref[:]
    ntaps = 2 * n + 1
    for vm, hm, o in zip(vs, hs, outs):
        _st = batched_store(o)
        t = jax.lax.dot(vm[:], img, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        Lp = jax.lax.dot(t, hm[:], precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        lh = Lp.shape[0] - 2 * n
        lw = Lp.shape[1] - 2 * n
        v0 = v1 = v2 = None
        for k in range(ntaps):
            row = Lp[k:k + lh, :]
            t0 = g[k] * row
            t1 = xg[k] * row
            t2 = xxg[k] * row
            v0 = t0 if v0 is None else v0 + t0
            v1 = t1 if v1 is None else v1 + t1
            v2 = t2 if v2 is None else v2 + t2
        m00 = m10 = m20 = m01 = m11 = m02 = None
        for k in range(ntaps):
            c0 = v0[:, k:k + lw]
            c1 = v1[:, k:k + lw]
            c2 = v2[:, k:k + lw]
            a = g[k] * c0
            b = xg[k] * c0
            c = xxg[k] * c0
            d = g[k] * c1
            e = xg[k] * c1
            f2 = g[k] * c2
            m00 = a if m00 is None else m00 + a
            m10 = b if m10 is None else m10 + b
            m20 = c if m20 is None else m20 + c
            m01 = d if m01 is None else m01 + d
            m11 = e if m11 is None else m11 + e
            m02 = f2 if m02 is None else m02 + f2
        _st(0, (m10 * ig11).astype(out_dtype))
        _st(1, (m01 * ig11).astype(out_dtype))
        _st(2, (m00 * ig03 + m20 * ig33).astype(out_dtype))
        _st(3, (m00 * ig03 + m02 * ig33).astype(out_dtype))
        _st(4, (m11 * ig55).astype(out_dtype))


def _coarse_polyexp_setup(h: int, w: int, levels: int, pyr_scale: float,
                          poly_n: int, poly_sigma: float):
    """Shared host-side setup of the fused coarse-polyexp kernels
    (single-frame and frame-batched twins): polyexp taps + inverse-Gram
    scalars, the coarse (lh, lw) plan entries, and the padded band
    matrices as device arrays. Single owner so the coefficient math
    cannot desynchronize between the twins."""
    from ..ops.farneback import _poly_inv_gram
    n = poly_n
    g, ig11, ig03, ig33, ig55 = _poly_inv_gram(n, float(poly_sigma))
    i = np.arange(-n, n + 1, dtype=np.float32)
    taps = (tuple(np.float32(v) for v in g),
            tuple(np.float32(v) for v in (i * g)),
            tuple(np.float32(v) for v in (i * i * g)))
    igs = (float(ig11), float(ig03), float(ig33), float(ig55))

    plan = farneback_levels(h, w, levels, pyr_scale)
    mats = _band_mats_padded(h, w, levels, float(pyr_scale), n)
    coarse = [(lh, lw) for (k, lh, lw, _s, _ks) in plan if k != 0]
    vs = [jnp.asarray(mats[i][0]) for i, p in enumerate(plan) if p[0] != 0]
    hs = [jnp.asarray(mats[i][1]) for i, p in enumerate(plan) if p[0] != 0]
    return taps, igs, coarse, vs, hs


@functools.partial(jax.jit, static_argnames=("levels", "pyr_scale",
                                             "poly_n", "poly_sigma",
                                             "out_dtype", "interpret"))
def coarse_polyexp_fused(img: jnp.ndarray, levels: int, pyr_scale: float,
                         poly_n: int, poly_sigma: float,
                         out_dtype=jnp.float32, interpret: bool = False):
    """Coefficient planes for every COARSE level (plan k >= 1) in ONE
    kernel launch: blur+resize as banded MXU contractions with the
    polyexp replicate padding baked into the band matrices, then the
    polyexp correlations on the VMEM-resident padded level image.

    Returns a list aligned with the coarse entries of farneback_levels
    (coarsest first); level 0 is the caller's business (its polyexp
    kernel over the full-res image is the dominant cost and already
    one launch). Fuses what used to be 1 levels launch + (nlev-1)
    polyexp launches, and drops the level-image HBM round trip.
    """
    h, w = img.shape
    n = poly_n
    taps, igs, coarse, vs, hs = _coarse_polyexp_setup(
        h, w, levels, pyr_scale, poly_n, poly_sigma)
    if not coarse:
        return []
    nl = len(coarse)
    outs = pl.pallas_call(
        functools.partial(_levels_polyexp_kernel, nl, n, taps, igs,
                          out_dtype),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * nl + 1),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(nl)),
        out_shape=tuple(jax.ShapeDtypeStruct((5, lh, lw), out_dtype)
                        for (lh, lw) in coarse),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(img.astype(jnp.float32), *vs, *hs)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return list(outs)


def _levels_polyexp_batch_kernel(nlev: int, n: int, taps, igs, out_dtype,
                                 img_ref, *refs):
    """Frame-batched twin: grid (N,); img/out blocks carry a leading
    batch axis of 1 (handled by rank inside _levels_polyexp_kernel), the
    band matrices are shared across frames."""
    _levels_polyexp_kernel(nlev, n, taps, igs, out_dtype, img_ref, *refs)


@functools.partial(jax.jit, static_argnames=("levels", "pyr_scale",
                                             "poly_n", "poly_sigma",
                                             "out_dtype", "interpret"))
def coarse_polyexp_fused_batch(imgs: jnp.ndarray, levels: int,
                               pyr_scale: float, poly_n: int,
                               poly_sigma: float, out_dtype=jnp.float32,
                               interpret: bool = False):
    """coarse_polyexp_fused for a (N, H, W) frame stack in ONE launch
    (grid (N,)): per-frame numerics identical; N frames share the band
    matrices and the launch cost (flow_iter_pairs rationale). Returns a
    list of (N, 5, lh, lw) arrays aligned with the coarse plan entries."""
    nB, h, w = imgs.shape
    n = poly_n
    taps, igs, coarse, vs, hs = _coarse_polyexp_setup(
        h, w, levels, pyr_scale, poly_n, poly_sigma)
    if not coarse:
        return []
    nl = len(coarse)
    in_specs = [pl.BlockSpec((1, h, w), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(v.shape, lambda b: (0, 0),
                              memory_space=pltpu.VMEM) for v in vs]
    in_specs += [pl.BlockSpec(m.shape, lambda b: (0, 0),
                              memory_space=pltpu.VMEM) for m in hs]
    outs = pl.pallas_call(
        functools.partial(_levels_polyexp_batch_kernel, nl, n, taps, igs,
                          out_dtype),
        grid=(nB,),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, 5, lh, lw), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for (lh, lw) in coarse),
        out_shape=tuple(jax.ShapeDtypeStruct((nB, 5, lh, lw), out_dtype)
                        for (lh, lw) in coarse),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the leading size-1 block axis pads each out block up a
            # tile, overflowing the usual 100M scoped budget by ~0.5M at
            # 1080p — v5e VMEM is 128M, so grant the headroom here
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(imgs.astype(jnp.float32), *vs, *hs)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return list(outs)


def _levels_kernel(nlev: int, img_ref, *refs):
    # refs = V_1..V_n, HmT_1..HmT_n, out_1..out_n
    vs = refs[:nlev]
    hs = refs[nlev:2 * nlev]
    outs = refs[2 * nlev:]
    img = img_ref[:]
    for v, hm, o in zip(vs, hs, outs):
        t = jax.lax.dot(v[:], img, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        o[:] = jax.lax.dot(t, hm[:], precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("levels", "pyr_scale",
                                             "interpret"))
def farneback_images_pallas(img: jnp.ndarray, levels: int,
                            pyr_scale: float,
                            interpret: bool = False) -> List[jnp.ndarray]:
    """Fused twin of ops.pyramid.farneback_images (coarsest first).

    2-D (H, W) input only (the XLA twin also takes batched stacks; batch
    callers should vmap or loop). Levels 1+ come from one Pallas call
    (two MXU contractions each, image resident once); level 0 uses the
    XLA shifted-add blur (3 taps, no resize — a full-res matmul would
    cost more than it saves)."""
    if img.ndim != 2:
        raise ValueError("farneback_images_pallas takes a single (H, W) "
                         "image; vmap/loop for batches")
    from ..ops.filters import gaussian_blur
    h, w = img.shape[-2], img.shape[-1]
    f = img.astype(jnp.float32)
    plan = farneback_levels(h, w, levels, pyr_scale)
    mats = _band_mats(h, w, levels, float(pyr_scale))

    coarse = [(k, lh, lw, sig, ks) for (k, lh, lw, sig, ks) in plan
              if k != 0]
    out_imgs: List = [None] * len(plan)

    if coarse:
        vs = [jnp.asarray(mats[i][0]) for i, p in enumerate(plan)
              if p[0] != 0]
        hs = [jnp.asarray(mats[i][1]) for i, p in enumerate(plan)
              if p[0] != 0]
        n = len(coarse)
        outs = pl.pallas_call(
            functools.partial(_levels_kernel, n),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n + 1),
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(n)),
            out_shape=tuple(jax.ShapeDtypeStruct((lh, lw), jnp.float32)
                            for (_k, lh, lw, _s, _ks) in coarse),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(f, *vs, *hs)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        ci = 0
        for i, p in enumerate(plan):
            if p[0] != 0:
                out_imgs[i] = outs[ci]
                ci += 1

    # level 0: blur only (ksize from the plan), no resize
    for i, (k, lh, lw, sigma, ksize) in enumerate(plan):
        if k == 0:
            out_imgs[i] = gaussian_blur(f, ksize, sigma,
                                        border="reflect101")
    return out_imgs
