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
