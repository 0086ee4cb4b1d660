"""Flow parity vs cv2 at realistic resolutions (480p/1080p, full default
Farneback parameters — the bench configurations' accuracy evidence)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kalman_hydra_tpu.config import FlowConfig
from kalman_hydra_tpu.io.synthetic import translating_pair
from kalman_hydra_tpu.ops.farneback import farneback
from kalman_hydra_tpu.ref import imgproc as ip


@pytest.mark.parametrize("h,w,shift", [(480, 854, (4.0, -2.5)),
                                       (1080, 1920, (6.0, 3.0))])
def test_farneback_parity_at_resolution(h, w, shift):
    a, b, _ = translating_pair(height=h, width=w, shift=shift, seed=3)
    a8 = np.round(a).astype(np.uint8)
    b8 = np.round(b).astype(np.uint8)
    cfg = FlowConfig()          # cv2 defaults: 15/5/3, poly 5/1.1
    ref = ip.farneback(a8, b8, cfg)
    got = np.asarray(jax.jit(
        lambda x, y: farneback(x, y, cfg))(
        jnp.asarray(a8.astype(np.float32)),
        jnp.asarray(b8.astype(np.float32))))
    epe = np.linalg.norm(got - ref, axis=-1)
    assert epe.mean() < 0.05                      # contract is < 0.5
    assert epe[16:-16, 16:-16].mean() < 0.01

    # the performance modes must hold the contract at scale too
    fast = FlowConfig(fast_warp=8, bf16_poly=True)
    got_f = np.asarray(jax.jit(
        lambda x, y: farneback(x, y, fast))(
        jnp.asarray(a8.astype(np.float32)),
        jnp.asarray(b8.astype(np.float32))))
    epe_f = np.linalg.norm(got_f - ref, axis=-1)
    assert epe_f.mean() < 0.05
    assert epe_f[16:-16, 16:-16].mean() < 0.02
