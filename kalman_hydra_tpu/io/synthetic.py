"""Synthetic clip generation with analytic ground truth.

TPU-native successor of the reference's synthetic-sequence validation
scripts (SURVEY.md §4: "synthetic moving shapes with known ground truth");
config 1 of BASELINE.json:7 ("synthetic 256x256 moving-blob clip") is
generated here.

All generation is host-side NumPy (it feeds both the OpenCV oracle and the
device pipeline), seeded and deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class SyntheticTruth:
    """Ground truth attached to a generated clip."""

    positions: np.ndarray   # (T, K, 2) float32 (x, y) per frame per point
    velocity: np.ndarray    # (T, 2) float32 blob velocity per frame (px/frame)


def _textured_background(h: int, w: int, rng: np.random.Generator) -> np.ndarray:
    """Band-limited random texture.

    A plain Gaussian blob is flow-ambiguous away from its rim (aperture
    problem), so the clip needs texture everywhere for dense flow to be
    well-posed (SURVEY.md §4.5).
    """
    noise = rng.standard_normal((h, w)).astype(np.float32)
    # cheap separable 5-tap binomial smoothing, a few passes (C-speed
    # convolve1d — pure-python row loops are too slow at 1080p)
    from scipy.ndimage import convolve1d
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0
    for _ in range(3):
        noise = convolve1d(noise, k, axis=0, mode="reflect")
        noise = convolve1d(noise, k, axis=1, mode="reflect")
    noise -= noise.min()
    noise /= max(noise.max(), 1e-6)
    return 0.25 + 0.35 * noise  # mid-grey texture in [0.25, 0.6]


def moving_blob_clip(
    num_frames: int = 16,
    height: int = 256,
    width: int = 256,
    blob_sigma: float = 12.0,
    velocity: tuple = (1.7, -1.1),
    accel: tuple = (0.0, 0.0),
    num_points: int = 16,
    seed: int = 0,
    color: bool = True,
):
    """Generate a textured clip with a bright blob moving at (near-)constant
    velocity, plus K tracked points riding on the blob.

    Returns
    -------
    frames : (T, H, W, 3) uint8 if color else (T, H, W) uint8
    truth : SyntheticTruth with per-frame point positions (x, y).
    """
    rng = np.random.default_rng(seed)
    bg = _textured_background(height, width, rng)

    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    c0 = np.array([width * 0.35, height * 0.6], dtype=np.float32)
    v = np.array(velocity, dtype=np.float32)
    a = np.array(accel, dtype=np.float32)

    # tracked points: fixed offsets from the blob center, inside ~1 sigma
    ang = rng.uniform(0, 2 * np.pi, size=num_points)
    rad = rng.uniform(0.2, 0.9, size=num_points) * blob_sigma
    offsets = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=-1).astype(np.float32)

    frames = np.empty((num_frames, height, width), dtype=np.float32)
    positions = np.empty((num_frames, num_points, 2), dtype=np.float32)
    vel_t = np.empty((num_frames, 2), dtype=np.float32)

    # The blob carries its own internal texture so that flow inside the blob
    # is observable (not just at the rim).
    blob_tex = _textured_background(height, width, rng)

    for t in range(num_frames):
        c = c0 + v * t + 0.5 * a * t * t
        vel_t[t] = v + a * t
        d = np.sqrt((xx - c[0]) ** 2 + (yy - c[1]) ** 2)
        # smooth plateau: ~1 inside 1.5*sigma, soft rim after — tracked points
        # (inside 0.9*sigma) see pure blob motion, not a blend with the static
        # background (which would bias the observed flow low).
        mask = (1.0 / (1.0 + np.exp((d - 1.5 * blob_sigma)
                                    / (0.25 * blob_sigma)))).astype(np.float32)
        # advect the blob texture rigidly with the blob
        shift = c - c0
        sx, sy = shift
        x_src = np.clip(xx - sx, 0, width - 1)
        y_src = np.clip(yy - sy, 0, height - 1)
        x0 = np.floor(x_src).astype(np.int32)
        y0 = np.floor(y_src).astype(np.int32)
        x1 = np.minimum(x0 + 1, width - 1)
        y1 = np.minimum(y0 + 1, height - 1)
        fx = x_src - x0
        fy = y_src - y0
        tex = (blob_tex[y0, x0] * (1 - fx) * (1 - fy)
               + blob_tex[y0, x1] * fx * (1 - fy)
               + blob_tex[y1, x0] * (1 - fx) * fy
               + blob_tex[y1, x1] * fx * fy)
        fg = 0.55 + 0.45 * tex
        frames[t] = bg * (1 - mask) + fg * mask
        positions[t] = c[None, :] + offsets

    frames8 = np.clip(frames * 255.0, 0, 255).astype(np.uint8)
    if color:
        frames8 = np.repeat(frames8[..., None], 3, axis=-1)
    return frames8, SyntheticTruth(positions=positions, velocity=vel_t)


def translating_pair(
    height: int = 128,
    width: int = 128,
    shift: tuple = (3.0, -2.0),
    seed: int = 0,
):
    """A single grayscale frame pair related by a rigid subpixel translation.

    Ground-truth dense flow is constant = `shift`; used by unit tests to
    score both the oracle and the TPU flow against analytic truth.
    Returns (a, b, flow_true) with a, b float32 in [0, 255].
    """
    rng = np.random.default_rng(seed)
    pad = 16
    big = _textured_background(height + 2 * pad, width + 2 * pad, rng) * 255.0

    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    a = big[pad:pad + height, pad:pad + width].astype(np.float32)

    # content moves BY +shift from a to b: b(p) = a(p - shift), so the
    # forward flow (prev=a -> next=b, OpenCV convention) is exactly +shift.
    sx, sy = shift
    x_src = xx + pad - sx
    y_src = yy + pad - sy
    x0 = np.floor(x_src).astype(np.int32)
    y0 = np.floor(y_src).astype(np.int32)
    fx = (x_src - x0).astype(np.float32)
    fy = (y_src - y0).astype(np.float32)
    b = (big[y0, x0] * (1 - fx) * (1 - fy)
         + big[y0, x0 + 1] * fx * (1 - fy)
         + big[y0 + 1, x0] * (1 - fx) * fy
         + big[y0 + 1, x0 + 1] * fx * fy).astype(np.float32)

    flow_true = np.broadcast_to(
        np.array(shift, dtype=np.float32), (height, width, 2)).copy()
    return a, b, flow_true
