"""Vision ops (XLA reference implementations; Pallas twins live in
kalman_hydra_tpu.kernels behind the same signatures)."""
from . import (color, farneback, features, filters, lk, pyramid, segment,  # noqa: F401
               warp)
