"""Render-channel device throughput (mesh-render observation, models/render).

Times `render_measure` (the per-frame Gauss-Newton vertex measurement) and
the full `render_step` on TPU with the relay-safe in-jit repeat-differencing
pattern (CLAUDE.md: block_until_ready does not sync through the axon relay).

The channel's cost model: ~3 bilinear gathers per GN sweep over P template
pixels (TPU gathers are per-index bound, ~7 ns/idx — BASELINE.md shootout),
plus 5 segment-sums onto V vertices. Expected ms/frame ~ 3 * iters * P * 4 *
7e-6; this tool verifies it and records how max_pixels subsampling trades
template size for fps.

Usage: python tools/render_timing.py [HxW=480x640] [V=64]
"""

import os
import sys
import time

os.environ.setdefault("KH_BENCH", "1")
sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    if os.environ.get("KH_CPU") == "1":
        # smoke-test path: the axon sitecustomize ignores JAX_PLATFORMS,
        # pin the backend before it initializes (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax import lax

    from kalman_hydra_tpu.config import EkfConfig
    from kalman_hydra_tpu.io.synthetic import deforming_body_clip
    from kalman_hydra_tpu.models import dynamics
    from kalman_hydra_tpu.models.ekf import init_tracks
    from kalman_hydra_tpu.models.mesh import mesh_from_mask
    from kalman_hydra_tpu.models.render import (make_template, render_measure,
                                                render_step)
    from kalman_hydra_tpu.ops.color import grayscale_u8
    from kalman_hydra_tpu.ops.segment import segment_body

    hw = sys.argv[1] if len(sys.argv) > 1 else "480x640"
    h, w = (int(s) for s in hw.split("x"))
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    frames, _truth, _strain = deforming_body_clip(num_frames=3, height=h,
                                                  width=w, seed=0)
    gray0 = np.asarray(grayscale_u8(jnp.asarray(frames[0])))
    mask = np.asarray(segment_body(jnp.asarray(gray0)))
    mesh = mesh_from_mask(mask, n_points=V, seed=0)
    cfg = EkfConfig(measurement="render", q=0.5)
    F = jnp.asarray(dynamics.transition(cfg))
    Q = jnp.asarray(dynamics.process_noise(cfg))
    gray1 = grayscale_u8(jnp.asarray(frames[1]))

    def marginal(fn, args, r1=1, r2=5):
        def repeat(R):
            def run(*a):
                def body(_i, acc):
                    return acc + fn(*a, acc) * 1e-6
                return lax.fori_loop(0, R, body, jnp.float32(0.0))
            return jax.jit(run).lower(*args).compile()
        out = {}
        for R in (r1, r2):
            comp = repeat(R)
            np.asarray(comp(*args))
            t0 = time.time()
            np.asarray(comp(*args))
            out[R] = time.time() - t0
        return (out[r2] - out[r1]) / (r2 - r1)

    for mp in (0, 20000, 5000):
        tmpl = make_template(gray0, mesh, max_pixels=mp)
        P = int(tmpl.tvals.shape[0])
        state = init_tracks(cfg, jnp.asarray(mesh.vertices))

        def meas(g, v, acc):
            z, _Rk, _val = render_measure(g + acc * 1e-20, tmpl, v, cfg)
            return jnp.sum(z) * 1e-6

        def full(g, acc):
            st, _aux = render_step(state, g + acc * 1e-20, cfg, F, Q, tmpl)
            return jnp.sum(st.x[:, 0]) * 1e-6

        vpred = jnp.asarray(mesh.vertices, jnp.float32)
        t_m = marginal(meas, (gray1, vpred))
        t_f = marginal(full, (gray1,))
        pred = 3 * cfg.render_iters * P * 4 * 7e-9
        print(f"{h}x{w} V={V} max_pixels={mp or 'full'} P={P}: "
              f"render_measure {t_m*1e3:.2f} ms, render_step {t_f*1e3:.2f} ms"
              f" ({1.0/max(t_f,1e-9):.1f} fps), gather-model {pred*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
