"""Stage timing v3: where the PALLAS-path 1080p pipeline (flow_iter +
polyexp kernels, bf16 planes) spends its ~9 ms/frame. Run solo on TPU."""

import sys
import time

sys.path.insert(0, ".")

# the round-3 bench winners (fi_shift_skip/fi_tile_h) are FlowConfig
# defaults now — every stage below times the production kernel config


def marginal(fn, args, r1=1, r2=5):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

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
        ts = []
        for _ in range(2):
            t0 = time.time()
            np.asarray(comp(*args))
            ts.append(time.time() - t0)
        out[R] = min(ts)
    return (out[r2] - out[r1]) / (r2 - r1)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np
    import jax.numpy as jnp
    from kalman_hydra_tpu.config import (EkfConfig, FlowConfig, RunConfig,
                                         TrackConfig)
    from kalman_hydra_tpu.ops import farneback as FB
    from kalman_hydra_tpu.ops.pyramid import farneback_images
    from kalman_hydra_tpu.ops.features import corner_pool
    from kalman_hydra_tpu.kernels.flow_iter_pallas import flow_iter
    from kalman_hydra_tpu import pipeline as PL

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    img_a = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    img_b = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    fcfg = FlowConfig(fast_warp=8, bf16_poly=True)
    rcfg = RunConfig(flow=fcfg, ekf=EkfConfig(state_dim=6),
                     tracks=TrackConfig(num_tracks=1024, corner_pool=1024),
                     impl="pallas")
    frames = jnp.asarray(
        rng.uniform(0, 255, (3, h, w, 3)).astype(np.float32))

    Ra = FB.polyexp_pyramid(img_a, fcfg, impl="pallas")
    Rb = FB.polyexp_pyramid(img_b, fcfg, impl="pallas")
    R0f, R1f = Ra[-1], Rb[-1]                     # finest level
    fl = jnp.asarray(rng.uniform(-3, 3, (2, h, w)).astype(np.float32))

    def t_images(a, acc):
        imgs = farneback_images(a + acc * 1e-20, fcfg.levels, fcfg.pyr_scale)
        return sum(jnp.sum(i[::64, ::64]) for i in imgs)

    def t_polyexp_pyr(a, acc):
        Rs = FB.polyexp_pyramid(a + acc * 1e-20, fcfg, impl="pallas")
        return sum(jnp.sum(r[:, ::64, ::64].astype(jnp.float32)) for r in Rs)

    def t_flow_from_pyr(acc):
        out = FB.farneback_from_pyramids(
            jax.tree.map(lambda x: x + (acc * 1e-20).astype(x.dtype), Ra),
            Rb, fcfg, impl="pallas")
        return jnp.sum(out[::64, ::64])

    def t_fine_iter(flow, acc):
        # production kernel config = the FlowConfig defaults (KH_FI_* env
        # knobs were retired round-4); keep this stage consistent with the
        # fcfg-driven stages above
        out = flow_iter(R0f, R1f, flow + acc * 1e-20, fcfg.winsize, 8, False,
                        tile_h=fcfg.fi_tile_h, shift_skip=fcfg.fi_shift_skip)
        return jnp.sum(out[:, ::64, ::64])

    def t_corner(a, acc):
        pts, sc = corner_pool(a + acc * 1e-20, rcfg.tracks)
        return jnp.sum(pts) * 1e-3 + jnp.sum(sc)

    def t_step(f, acc):
        step = PL.make_step(rcfg)
        carry = PL.init_from_frame(f[0] + acc * 1e-20, rcfg)
        carry, out = step(carry, f[1])
        carry, out = step(carry, f[2])
        return jnp.sum(out["pos"]) * 1e-3

    cases = [
        ("full step x2 (+init)", t_step, (frames,)),
        ("level images (1 frame)", t_images, (img_a,)),
        ("polyexp pyramid pallas bf16", t_polyexp_pyr, (img_a,)),
        ("flow all levels (pallas)", t_flow_from_pyr, ()),
        ("fine-level flow_iter x1", t_fine_iter, (fl,)),
        ("corner pool 1080p", t_corner, (img_a,)),
    ]
    for name, fn, args in cases:
        try:
            dt = marginal(fn, args)
            print(f"{name:30s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
