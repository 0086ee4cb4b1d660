"""Grayscale conversion (cv2.cvtColor BGR2GRAY twin).

OpenCV converts uint8 BGR with the fixed-point BT.601 weights
(R*4899 + G*9617 + B*1868 + 8192) >> 14, which is what `grayscale_u8`
reproduces bit-exactly so the device pipeline sees the same intensities the
oracle feeds to cv2 (SURVEY.md §2.3). The float path is the fused in-pipeline
version (XLA folds it into downstream filtering).
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
