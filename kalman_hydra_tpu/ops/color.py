"""Grayscale conversion (cv2.cvtColor BGR2GRAY twin).

OpenCV 5.x converts uint8 BGR with the 15-bit fixed-point BT.601 weights
(B*3735 + G*19235 + R*9798 + 16384) >> 15, which is what `grayscale_u8`
reproduces bit-exactly against the INSTALLED cv2 5.0.0 oracle (and what
native/frameloader.cpp hand-codes). NOTE: OpenCV 4.x used a 14-bit variant
that differs on ~0.3% of pixels — parity is against the 5.x oracle
(SURVEY.md §2.3). The float path is the fused in-pipeline version (XLA
folds it into downstream filtering).
"""

from __future__ import annotations

import jax.numpy as jnp

# cv2 5.x fixed-point BT.601 (15-bit) coefficients for B, G, R
_B, _G, _R = 3735, 19235, 9798


def grayscale_u8(frame: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) uint8 BGR -> (..., H, W) float32 holding exact uint8
    gray values (bit-identical to cv2.cvtColor on uint8)."""
    if frame.ndim >= 3 and frame.shape[-1] == 3:
        if not jnp.issubdtype(frame.dtype, jnp.integer):
            # float color frames take cv2's FLOAT cvtColor path: the
            # fixed-point int32 cast would truncate (a [0,1]-normalized
            # clip silently became all-black -> zero flow)
            return grayscale(frame)
        f = frame.astype(jnp.int32)
        y = (f[..., 0] * _B + f[..., 1] * _G + f[..., 2] * _R
             + (1 << 14)) >> 15
        return y.astype(jnp.float32)
    return frame.astype(jnp.float32)


def grayscale(frame: jnp.ndarray) -> jnp.ndarray:
    """Float grayscale (no uint8 rounding): Y = .299R + .587G + .114B."""
    if frame.ndim >= 3 and frame.shape[-1] == 3:
        f = frame.astype(jnp.float32)
        return f[..., 0] * 0.114 + f[..., 1] * 0.587 + f[..., 2] * 0.299
    return frame.astype(jnp.float32)
