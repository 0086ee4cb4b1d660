"""Body segmentation: Otsu threshold + morphological cleanup, pure XLA.

Rebuild of the reference's object-segmentation stage (SURVEY.md §2.1 #5:
"object segmentation (threshold + contours) to find the Hydra body").
The threshold is cv2.threshold(..., THRESH_OTSU)-parity (256-bin histogram,
between-class variance argmax); "contours" are rescoped to a cleaned
foreground mask (morphological open/close via min/max pooling) plus a
largest-ish-component filter implemented as iterated mask dilation from the
strongest seed — all static-shape, jit-safe ops.

Used to restrict track seeding to the animal body (`corner_pool(...,
mask=...)` path) and as the region prior for mesh construction.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def otsu_threshold(gray: jnp.ndarray) -> jnp.ndarray:
    """Otsu's threshold on a (H, W) image with values in [0, 255].

    Returns the scalar threshold (float32); pixels > t are foreground,
    matching cv2.threshold(..., THRESH_BINARY | THRESH_OTSU).
    """
    hist = jnp.histogram(gray, bins=256, range=(0.0, 256.0))[0].astype(
        jnp.float32)
    total = jnp.sum(hist)
    bin_vals = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)                       # class-0 count for t = bin
    sum0 = jnp.cumsum(hist * bin_vals)
    sum_all = sum0[-1]
    w1 = total - w0
    mu0 = sum0 / jnp.maximum(w0, 1.0)
    mu1 = (sum_all - sum0) / jnp.maximum(w1, 1.0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    valid = (w0 > 0) & (w1 > 0)
    between = jnp.where(valid, between, -1.0)
    return jnp.argmax(between).astype(jnp.float32)


def _pool(mask: jnp.ndarray, size: int, op: str) -> jnp.ndarray:
    """size x size min/max pooling (erode/dilate) with edge padding."""
    if size % 2 == 0:
        # symmetric (r, r) padding only preserves shape for odd windows;
        # an even size would grow the output by one pixel per call and
        # crash downstream with a broadcast error deep in jit
        raise ValueError(f"morphology window must be odd, got {size}")
    r = size // 2
    init = -jnp.inf if op == "max" else jnp.inf
    fn = lax.max if op == "max" else lax.min
    out = lax.reduce_window(
        mask, init, fn, (size, size), (1, 1),
        [(r, r), (r, r)])
    return out


def morph_open(mask, size: int = 5):
    return _pool(_pool(mask, size, "min"), size, "max")


def morph_close(mask, size: int = 5):
    return _pool(_pool(mask, size, "max"), size, "min")


@functools.partial(jax.jit, static_argnames=("morph_size", "grow_iters",
                                             "invert"))
def segment_body(gray: jnp.ndarray, morph_size: int = 5,
                 grow_iters: int = 64, invert: bool = False) -> jnp.ndarray:
    """(H, W) float32 [0,255] -> float32 {0,1} foreground mask.

    Otsu threshold -> close -> open -> keep the connected region around the
    strongest foreground response (geodesic dilation from the foreground
    centroid-max seed, `grow_iters` fixed iterations — static-shape
    stand-in for 'largest contour').
    """
    t = otsu_threshold(gray)
    fg = (gray < t) if invert else (gray > t)
    fg = fg.astype(jnp.float32)
    fg = morph_close(fg, morph_size)
    fg = morph_open(fg, morph_size)

    # seed at the max of the distance-ish transform (box-blurred mask)
    from .filters import box_blur2d
    score = box_blur2d(fg, 15) * fg
    idx = jnp.argmax(score)
    h, w = fg.shape
    seed = jnp.zeros_like(fg).reshape(-1).at[idx].set(1.0).reshape(h, w)

    def grow(_i, m):
        return jnp.minimum(_pool(m, 3, "max"), fg)

    region = lax.fori_loop(0, grow_iters, grow, seed)
    return region


def mask_scores(score: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero a corner-response map outside the segmentation mask."""
    return jnp.where(mask > 0, score, 0.0)
