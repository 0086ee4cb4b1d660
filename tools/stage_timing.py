"""Per-stage TPU timing with relay-safe methodology (scalar fetch +
repeat-count differencing). Directs Pallas-kernel effort to where the
time actually goes.

  python tools/stage_timing.py [--h 1080 --w 1920]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, ".")


def marginal_time(make_fn, arg, r1=1, r2=5):
    """Steady per-iteration time of fn via in-jit repeat differencing."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def repeat(R):
        def run(a):
            def body(_i, acc):
                out = make_fn(a, acc)
                return acc + out * 1e-6
            return lax.fori_loop(0, R, body, jnp.float32(0.0))
        return jax.jit(run).lower(arg).compile()

    times = {}
    for R in (r1, r2):
        comp = repeat(R)
        np.asarray(comp(arg))
        times[R] = min(_t(comp, arg) for _ in range(2))
    return (times[r2] - times[r1]) / (r2 - r1)


def _t(comp, *a):
    t0 = time.time()
    np.asarray(comp(*a))
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    args = ap.parse_args()
    h, w = args.h, args.w

    import jax.numpy as jnp
    from kalman_hydra_tpu.config import EkfConfig, FlowConfig, TrackConfig
    from kalman_hydra_tpu.io.synthetic import translating_pair
    from kalman_hydra_tpu.models import dynamics as dyn, ekf as jekf
    from kalman_hydra_tpu.ops import farneback as FB
    from kalman_hydra_tpu.ops import features as feat
    from kalman_hydra_tpu.ops import pyramid as P
    from kalman_hydra_tpu.ops.warp import sample_flow

    a, b, _ = translating_pair(height=h, width=w, shift=(3.0, -2.0))
    a_d = jnp.asarray(a)
    b_d = jnp.asarray(b)
    fcfg = FlowConfig()
    tcfg = TrackConfig(num_tracks=1024, corner_pool=1024)
    ecfg = EkfConfig(state_dim=6)

    def stage_farneback(x, acc):
        fl = FB.farneback(x + acc * 1e-20, b_d, fcfg)
        return jnp.sum(fl[::64, ::64])

    def stage_polyexp(x, acc):
        r = FB.poly_expansion(x + acc * 1e-20, fcfg.poly_n, fcfg.poly_sigma)
        return jnp.sum(r[::64, ::64])

    def stage_pyramid(x, acc):
        imgs = P.farneback_images(x + acc * 1e-20, fcfg.levels, fcfg.pyr_scale)
        return sum(jnp.sum(i[::32, ::32]) for i in imgs)

    def stage_update(x, acc):
        R0 = FB.poly_expansion(x, fcfg.poly_n, fcfg.poly_sigma)
        flow = jnp.zeros((h, w, 2)) + acc * 1e-20
        M = FB.update_matrices(R0, R0, flow)
        fl = FB.update_flow(M, fcfg.winsize, False)
        return jnp.sum(fl[::64, ::64])

    def stage_corners(x, acc):
        pts, score = feat.corner_pool(x + acc * 1e-20, tcfg)
        return jnp.sum(score)

    F = dyn.transition(ecfg)
    Q = dyn.process_noise(ecfg)
    Rm = jnp.asarray(ecfg.r * np.eye(2, dtype=np.float32))
    K = tcfg.num_tracks
    x0 = jnp.zeros((K, 6))
    P0 = jnp.broadcast_to(jnp.eye(6) * 2, (K, 6, 6))
    flow0 = jnp.zeros((h, w, 2))

    def stage_ekf(x, acc):
        xs = x0 + acc * 1e-20
        xp, Pp = jekf.predict(xs, P0, jnp.asarray(F), jnp.asarray(Q))
        z = sample_flow(flow0, xp[:, 0:2]) + xp[:, 0:2]
        y = z - xp[:, 0:2]
        xn, Pn, nis = jekf.update(xp, Pp, y, jnp.asarray(dyn.position_H(ecfg)), Rm)
        return jnp.sum(xn) + jnp.sum(nis)

    for name, fn, arg in [
        ("full farneback", stage_farneback, a_d),
        ("  pyramid(6 lvls, blur+resize)", stage_pyramid, a_d),
        ("  polyexp (1 img, full res)", stage_polyexp, a_d),
        ("  updateM+blur+solve (full res)", stage_update, a_d),
        ("corner_pool (Shi-Tomasi+topk)", stage_corners, a_d),
        ("EKF 1024 tracks 6-state", stage_ekf, a_d),
    ]:
        dt = marginal_time(fn, arg)
        print(f"{name:36s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
